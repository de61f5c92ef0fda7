"""
Cosmos causal-3D video tokenizer layers (factorized path).

Behavioral parity with reference
uniception/models/libs/cosmos_tokenizer/modules/layers3d.py:48-965:
CausalConv3d (first-frame replication in time + constant spatial pad),
hybrid causal up/downsampling, factorized causal resnet blocks,
spatial + causal-temporal attention, and both encoder/decoder variants:
FACTORIZED (used by the shipped CV/DV tokenizer configs) and the
non-factorized BASE variant (layers3d.py:448-684).

Data layout is (B, C, T, H, W) at module boundaries (reference parity);
convs run channels-last internally.
"""

import math
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.libs.cosmos_tokenizer.modules.patching import Patcher, Patcher3D, UnPatcher, UnPatcher3D
from uniception_tpu.nn.common import Identity
from uniception_tpu.ops.attention import scaled_dot_product_attention

__all__ = [
    "CausalConv3d",
    "CausalNormalize",
    "CausalUpsample3d",
    "CausalDownsample3d",
    "CausalHybridUpsample3d",
    "CausalHybridDownsample3d",
    "CausalResnetBlock3d",
    "CausalResnetBlockFactorized3d",
    "CausalAttnBlock",
    "CausalTemporalAttnBlock",
    "EncoderBase",
    "DecoderBase",
    "EncoderFactorized",
    "DecoderFactorized",
]

_LEGACY_NUM_GROUPS = 32  # GroupNorm default for the BASE variant (layers3d.py:45)


def nonlinearity(x):
    return x * jax.nn.sigmoid(x)


def _cast3(k):
    return k if isinstance(k, tuple) else (k, k, k)


class CausalConv3d(nnx.Module):
    "3D conv with causal temporal padding (layers3d.py:48-95). (B,C,T,H,W) API."

    def __init__(
        self,
        chan_in: int = 1,
        chan_out: int = 1,
        kernel_size: Union[int, Tuple[int, int, int]] = 3,
        stride: int = 1,
        time_stride: int = 1,
        padding: int = 1,
        dilation: int = 1,
        time_dilation: int = 1,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs,
    ):
        kt, kh, kw = _cast3(kernel_size)
        self.time_pad = time_dilation * (kt - 1) + (1 - time_stride)
        self.spatial_pad = padding
        self.conv3d = nnx.Conv(
            chan_in,
            chan_out,
            kernel_size=(kt, kh, kw),
            strides=(time_stride, stride, stride),
            kernel_dilation=(time_dilation, dilation, dilation),
            padding="VALID",
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

    def __call__(self, x):
        "x: (B, C, T, H, W)."
        p = self.spatial_pad
        if self.time_pad:
            x_prev = jnp.repeat(x[:, :, :1], self.time_pad, axis=2)
            x = jnp.concatenate([x_prev, x], axis=2)
        if p:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (p, p), (p, p)))
        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # (B, T, H, W, C)
        x = self.conv3d(x)
        return jnp.transpose(x, (0, 4, 1, 2, 3))


class CausalNormalize(nnx.Module):
    """GroupNorm with per-frame stats when num_groups == 1 (causal), else
    legacy spatio-temporal stats over the whole clip (utils.py:64-81)."""

    def __init__(self, in_channels, num_groups=1, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.norm = nnx.GroupNorm(in_channels, num_groups=num_groups, epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_groups = num_groups

    def __call__(self, x):
        "x: (B, C, T, H, W)."
        B, C, T, H, W = x.shape
        if self.num_groups == 1:
            x = jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(B * T, H, W, C)
            x = self.norm(x)
            return jnp.transpose(x.reshape(B, T, H, W, C), (0, 4, 1, 2, 3))
        # legacy non-causal: stats over (T, H, W, C/group) jointly
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        x = self.norm(x)
        return jnp.transpose(x, (0, 4, 1, 2, 3))


def _replication_pad_time(x):
    return jnp.concatenate([x[:, :, :1], x], axis=2)


class CausalUpsample3d(nnx.Module):
    "Nearest 2x spatial + causal temporal repeat + conv (layers3d.py:98-113)."

    def __init__(self, in_channels, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.conv = CausalConv3d(in_channels, in_channels, 3, stride=1, padding=1, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=3), 2, axis=4)
        time_factor = 2 if x.shape[2] > 1 else 1
        x = jnp.repeat(x, time_factor, axis=2)
        x = self.conv(x)
        return x[:, :, time_factor - 1 :]


class CausalDownsample3d(nnx.Module):
    "Strided causal conv downsample (layers3d.py:116-133)."

    def __init__(self, in_channels, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.conv = CausalConv3d(
            in_channels, in_channels, 3, stride=2, time_stride=2, padding=0, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
        x = _replication_pad_time(x)
        return self.conv(x)


class CausalHybridUpsample3d(nnx.Module):
    "Factorized temporal+spatial upsample with residual convs (layers3d.py:136-192)."

    def __init__(self, in_channels, spatial_up=True, temporal_up=True, *, dtype=None, param_dtype=jnp.float32, rngs, **_):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv1 = CausalConv3d(in_channels, in_channels, (3, 1, 1), stride=1, time_stride=1, padding=0, **kw)
        self.conv2 = CausalConv3d(in_channels, in_channels, (1, 3, 3), stride=1, time_stride=1, padding=1, **kw)
        self.conv3 = CausalConv3d(in_channels, in_channels, 1, stride=1, time_stride=1, padding=0, **kw)
        self.spatial_up = spatial_up
        self.temporal_up = temporal_up

    def __call__(self, x):
        if not self.spatial_up and not self.temporal_up:
            return x
        if self.temporal_up:
            time_factor = 2 if x.shape[2] > 1 else 1
            x = jnp.repeat(x, time_factor, axis=2)[:, :, time_factor - 1 :]
            x = self.conv1(x) + x
        if self.spatial_up:
            x = jnp.repeat(jnp.repeat(x, 2, axis=3), 2, axis=4)
            x = self.conv2(x) + x
        return self.conv3(x)


class CausalHybridDownsample3d(nnx.Module):
    "Factorized spatial+temporal downsample: conv + avg-pool mix (layers3d.py:195-252)."

    def __init__(self, in_channels, spatial_down=True, temporal_down=True, *, dtype=None, param_dtype=jnp.float32, rngs, **_):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv1 = CausalConv3d(in_channels, in_channels, (1, 3, 3), stride=2, time_stride=1, padding=0, **kw)
        self.conv2 = CausalConv3d(in_channels, in_channels, (3, 1, 1), stride=1, time_stride=2, padding=0, **kw)
        self.conv3 = CausalConv3d(in_channels, in_channels, 1, stride=1, time_stride=1, padding=0, **kw)
        self.spatial_down = spatial_down
        self.temporal_down = temporal_down

    def __call__(self, x):
        if not self.spatial_down and not self.temporal_down:
            return x
        if self.spatial_down:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
            x1 = self.conv1(x)
            x2 = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 1, 1, 2, 2), (1, 1, 1, 2, 2), "VALID"
            ) / 4.0
            x = x1 + x2
        if self.temporal_down:
            x = _replication_pad_time(x)
            x1 = self.conv2(x)
            x2 = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 1, 2, 1, 1), (1, 1, 2, 1, 1), "VALID"
            ) / 2.0
            x = x1 + x2
        return self.conv3(x)


class Seq3d(nnx.Module):
    "Sequential with integer paths (matches torch nn.Sequential keys)."

    def __init__(self, *layers):
        self._n = len(layers)
        for i, layer in enumerate(layers):
            setattr(self, str(i), layer)

    def __call__(self, x):
        for i in range(self._n):
            x = getattr(self, str(i))(x)
        return x


class CausalResnetBlock3d(nnx.Module):
    "Non-factorized causal resnet block with full 3x3x3 convs (layers3d.py:255-291)."

    def __init__(self, *, in_channels, out_channels=None, dropout=0.0, num_groups=1, dtype=None, param_dtype=jnp.float32, rngs):
        out_channels = in_channels if out_channels is None else out_channels
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = CausalNormalize(in_channels, num_groups=num_groups, **kw)
        self.conv1 = CausalConv3d(in_channels, out_channels, 3, stride=1, padding=1, **kw)
        self.norm2 = CausalNormalize(out_channels, num_groups=num_groups, **kw)
        self.conv2 = CausalConv3d(out_channels, out_channels, 3, stride=1, padding=1, **kw)
        self.nin_shortcut = (
            CausalConv3d(in_channels, out_channels, 1, stride=1, padding=0, **kw)
            if in_channels != out_channels
            else Identity()
        )

    def __call__(self, x):
        h = self.conv1(nonlinearity(self.norm1(x)))
        h = self.conv2(nonlinearity(self.norm2(h)))
        return self.nin_shortcut(x) + h


class CausalResnetBlockFactorized3d(nnx.Module):
    "Factorized causal resnet block (layers3d.py:294-360)."

    def __init__(self, *, in_channels, out_channels=None, dropout=0.0, num_groups=1, dtype=None, param_dtype=jnp.float32, rngs):
        out_channels = in_channels if out_channels is None else out_channels
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = CausalNormalize(in_channels, num_groups=1, **kw)
        self.conv1 = Seq3d(
            CausalConv3d(in_channels, out_channels, (1, 3, 3), stride=1, padding=1, **kw),
            CausalConv3d(out_channels, out_channels, (3, 1, 1), stride=1, padding=0, **kw),
        )
        self.norm2 = CausalNormalize(out_channels, num_groups=num_groups, **kw)
        self.conv2 = Seq3d(
            CausalConv3d(out_channels, out_channels, (1, 3, 3), stride=1, padding=1, **kw),
            CausalConv3d(out_channels, out_channels, (3, 1, 1), stride=1, padding=0, **kw),
        )
        self.nin_shortcut = (
            CausalConv3d(in_channels, out_channels, 1, stride=1, padding=0, **kw)
            if in_channels != out_channels
            else Identity()
        )

    def __call__(self, x):
        h = self.conv1(nonlinearity(self.norm1(x)))
        h = self.conv2(nonlinearity(self.norm2(h)))
        return self.nin_shortcut(x) + h


class CausalAttnBlock(nnx.Module):
    "Per-frame spatial attention (layers3d.py:363-401)."

    def __init__(self, in_channels, num_groups=1, *, dtype=None, param_dtype=jnp.float32, rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm = CausalNormalize(in_channels, num_groups=num_groups, **kw)
        self.q = CausalConv3d(in_channels, in_channels, 1, stride=1, padding=0, **kw)
        self.k = CausalConv3d(in_channels, in_channels, 1, stride=1, padding=0, **kw)
        self.v = CausalConv3d(in_channels, in_channels, 1, stride=1, padding=0, **kw)
        self.proj_out = CausalConv3d(in_channels, in_channels, 1, stride=1, padding=0, **kw)

    def __call__(self, x):
        B, C, T, H, W = x.shape
        h_ = self.norm(x)
        q, k, v = self.q(h_), self.k(h_), self.v(h_)
        # fold time into batch, attend over H*W
        def fold(t):
            return jnp.transpose(t, (0, 2, 3, 4, 1)).reshape(B * T, H * W, 1, C)

        out = scaled_dot_product_attention(fold(q), fold(k), fold(v), scale=C**-0.5)
        out = jnp.transpose(out.reshape(B, T, H, W, C), (0, 4, 1, 2, 3))
        return x + self.proj_out(out)


class CausalTemporalAttnBlock(nnx.Module):
    "Causal attention over time per spatial location (layers3d.py:404-445)."

    def __init__(self, in_channels, num_groups=1, *, dtype=None, param_dtype=jnp.float32, rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm = CausalNormalize(in_channels, num_groups=num_groups, **kw)
        self.q = CausalConv3d(in_channels, in_channels, 1, stride=1, padding=0, **kw)
        self.k = CausalConv3d(in_channels, in_channels, 1, stride=1, padding=0, **kw)
        self.v = CausalConv3d(in_channels, in_channels, 1, stride=1, padding=0, **kw)
        self.proj_out = CausalConv3d(in_channels, in_channels, 1, stride=1, padding=0, **kw)

    def __call__(self, x):
        B, C, T, H, W = x.shape
        h_ = self.norm(x)
        q, k, v = self.q(h_), self.k(h_), self.v(h_)

        def fold(t):
            # (B, C, T, H, W) -> (B*H*W, T, C)
            return jnp.transpose(t, (0, 3, 4, 2, 1)).reshape(B * H * W, T, C)

        qf, kf, vf = fold(q), fold(k), fold(v)
        logits = jnp.einsum("btc,bsc->bts", qf, kf) * (C**-0.5)
        mask = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(mask[None], logits, -jnp.inf)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bts,bsc->btc", weights, vf)
        out = jnp.transpose(out.reshape(B, H, W, T, C), (0, 4, 3, 1, 2))
        return x + self.proj_out(out)


class _Container(nnx.Module):
    pass


def _per_frame(fn, x):
    "Apply a 2D (B,C,H,W) fn per frame of a (B,C,T,H,W) video (utils.py:23-33 time2batch)."
    B, C, T, H, W = x.shape
    y = fn(jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(B * T, C, H, W))
    return jnp.transpose(y.reshape(B, T, *y.shape[1:]), (0, 2, 1, 3, 4))


class EncoderBase(nnx.Module):
    """Non-factorized causal video encoder (layers3d.py:448-567). (B,C,T,H,W) API.

    Differences from EncoderFactorized: full 3x3x3 convs, spatial-only
    attention, per-frame 2D patching, CausalDownsample3d at every level
    but the last, and a replication-padded temporal avg-pool at the last
    level (layers3d.py:546-557).
    """

    def __init__(
        self,
        in_channels: int,
        channels: int,
        channels_mult: List[int],
        num_res_blocks: int,
        attn_resolutions: List[int],
        dropout: float,
        resolution: int,
        z_channels: int,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs=None,
        **ignore_kwargs,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_resolutions = len(channels_mult)
        self.num_res_blocks = num_res_blocks

        patch_size = ignore_kwargs.get("patch_size", 1)
        self.patcher = Patcher(patch_size, ignore_kwargs.get("patch_method", "rearrange"))
        in_channels = in_channels * patch_size * patch_size

        self.conv_in = CausalConv3d(in_channels, channels, 3, stride=1, padding=1, **kw)

        num_groups = ignore_kwargs.get("num_groups", _LEGACY_NUM_GROUPS)
        curr_res = resolution // patch_size
        in_ch_mult = (1,) + tuple(channels_mult)
        self.down = nnx.List([])
        block_in = channels
        for i_level in range(self.num_resolutions):
            block, attn = [], []
            block_in = channels * in_ch_mult[i_level]
            block_out = channels * channels_mult[i_level]
            for _ in range(num_res_blocks):
                block.append(CausalResnetBlock3d(in_channels=block_in, out_channels=block_out, dropout=dropout, num_groups=num_groups, **kw))
                block_in = block_out
                if curr_res in attn_resolutions:
                    attn.append(CausalAttnBlock(block_in, num_groups=num_groups, **kw))
            down = _Container()
            down.block = nnx.List(block)
            down.attn = nnx.List(attn)
            if i_level != self.num_resolutions - 1:
                down.downsample = CausalDownsample3d(block_in, **kw)
                curr_res = curr_res // 2
            self.down.append(down)

        self.mid = _Container()
        self.mid.block_1 = CausalResnetBlock3d(in_channels=block_in, out_channels=block_in, dropout=dropout, num_groups=num_groups, **kw)
        self.mid.attn_1 = CausalAttnBlock(block_in, num_groups=num_groups, **kw)
        self.mid.block_2 = CausalResnetBlock3d(in_channels=block_in, out_channels=block_in, dropout=dropout, num_groups=num_groups, **kw)

        self.norm_out = CausalNormalize(block_in, num_groups=num_groups, **kw)
        self.conv_out = CausalConv3d(block_in, z_channels, 3, stride=1, padding=1, **kw)

    def __call__(self, x):
        x = _per_frame(self.patcher, x)
        h = self.conv_in(x)
        for i_level in range(self.num_resolutions):
            down = self.down[i_level]
            for i_block in range(self.num_res_blocks):
                h = down.block[i_block](h)
                if len(down.attn) > 0:
                    h = down.attn[i_block](h)
            if i_level != self.num_resolutions - 1:
                h = down.downsample(h)
            else:
                # causal temporal downsample: replication-pad then avg-pool
                # over time (layers3d.py:546-557)
                tf = 2 if h.shape[2] > 1 else 1
                h = _replication_pad_time(h)
                h = jax.lax.reduce_window(
                    h, 0.0, jax.lax.add, (1, 1, tf, 1, 1), (1, 1, 2, 1, 1), "VALID"
                ) / float(tf)
        h = self.mid.block_1(h)
        h = self.mid.attn_1(h)
        h = self.mid.block_2(h)
        return self.conv_out(nonlinearity(self.norm_out(h)))


class DecoderBase(nnx.Module):
    """Non-factorized causal video decoder (layers3d.py:570-684). (B,C,T,H,W) API.

    Mirrors EncoderBase; at the final level the temporal upsample is a
    causal repeat-and-drop (layers3d.py:669-676), and the output is
    per-frame 2D unpatched.
    """

    def __init__(
        self,
        out_channels: int,
        channels: int,
        channels_mult: List[int],
        num_res_blocks: int,
        attn_resolutions: List[int],
        dropout: float,
        resolution: int,
        z_channels: int,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs=None,
        **ignore_kwargs,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_resolutions = len(channels_mult)
        self.num_res_blocks = num_res_blocks

        patch_size = ignore_kwargs.get("patch_size", 1)
        self.unpatcher = UnPatcher(patch_size, ignore_kwargs.get("patch_method", "rearrange"))
        out_ch = out_channels * patch_size * patch_size

        block_in = channels * channels_mult[self.num_resolutions - 1]
        curr_res = (resolution // patch_size) // 2 ** (self.num_resolutions - 1)

        self.conv_in = CausalConv3d(z_channels, block_in, 3, stride=1, padding=1, **kw)

        num_groups = ignore_kwargs.get("num_groups", _LEGACY_NUM_GROUPS)

        self.mid = _Container()
        self.mid.block_1 = CausalResnetBlock3d(in_channels=block_in, out_channels=block_in, dropout=dropout, num_groups=num_groups, **kw)
        self.mid.attn_1 = CausalAttnBlock(block_in, num_groups=num_groups, **kw)
        self.mid.block_2 = CausalResnetBlock3d(in_channels=block_in, out_channels=block_in, dropout=dropout, num_groups=num_groups, **kw)

        ups = []
        for i_level in reversed(range(self.num_resolutions)):
            block, attn = [], []
            block_out = channels * channels_mult[i_level]
            for _ in range(num_res_blocks + 1):
                block.append(CausalResnetBlock3d(in_channels=block_in, out_channels=block_out, dropout=dropout, num_groups=num_groups, **kw))
                block_in = block_out
                if curr_res in attn_resolutions:
                    attn.append(CausalAttnBlock(block_in, num_groups=num_groups, **kw))
            up = _Container()
            up.block = nnx.List(block)
            up.attn = nnx.List(attn)
            if i_level != 0:
                up.upsample = CausalUpsample3d(block_in, **kw)
                curr_res = curr_res * 2
            ups.insert(0, up)
        self.up = nnx.List(ups)

        self.norm_out = CausalNormalize(block_in, num_groups=num_groups, **kw)
        self.conv_out = CausalConv3d(block_in, out_ch, 3, stride=1, padding=1, **kw)

    def __call__(self, z):
        h = self.conv_in(z)
        h = self.mid.block_1(h)
        h = self.mid.attn_1(h)
        h = self.mid.block_2(h)
        for i_level in reversed(range(self.num_resolutions)):
            up = self.up[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = up.block[i_block](h)
                if len(up.attn) > 0:
                    h = up.attn[i_block](h)
            if i_level != 0:
                h = up.upsample(h)
            else:
                # causal temporal upsample: repeat then drop leading frames
                tf = 2 if h.shape[2] > 1 else 1
                h = jnp.repeat(h, tf, axis=2)[:, :, tf - 1 :]
        h = self.conv_out(nonlinearity(self.norm_out(h)))
        return _per_frame(self.unpatcher, h)


class EncoderFactorized(nnx.Module):
    "Factorized causal video encoder (layers3d.py:686-829). (B,C,T,H,W) API."

    def __init__(
        self,
        in_channels: int,
        channels: int,
        channels_mult: List[int],
        num_res_blocks: int,
        attn_resolutions: List[int],
        dropout: float,
        resolution: int,
        z_channels: int,
        spatial_compression: int = 16,
        temporal_compression: int = 8,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs=None,
        **ignore_kwargs,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_resolutions = len(channels_mult)
        self.num_res_blocks = num_res_blocks

        patch_size = ignore_kwargs.get("patch_size", 1)
        self.patcher3d = Patcher3D(patch_size, ignore_kwargs.get("patch_method", "rearrange"))
        in_channels = in_channels * patch_size**3

        self.num_spatial_downs = int(math.log2(spatial_compression)) - int(math.log2(patch_size))
        self.num_temporal_downs = int(math.log2(temporal_compression)) - int(math.log2(patch_size))

        self.conv_in = Seq3d(
            CausalConv3d(in_channels, channels, (1, 3, 3), stride=1, padding=1, **kw),
            CausalConv3d(channels, channels, (3, 1, 1), stride=1, padding=0, **kw),
        )

        curr_res = resolution // patch_size
        in_ch_mult = (1,) + tuple(channels_mult)
        self.down = nnx.List([])
        block_in = channels
        for i_level in range(self.num_resolutions):
            block, attn = [], []
            block_in = channels * in_ch_mult[i_level]
            block_out = channels * channels_mult[i_level]
            for _ in range(num_res_blocks):
                block.append(CausalResnetBlockFactorized3d(in_channels=block_in, out_channels=block_out, dropout=dropout, num_groups=1, **kw))
                block_in = block_out
                if curr_res in attn_resolutions:
                    attn.append(Seq3d(CausalAttnBlock(block_in, num_groups=1, **kw), CausalTemporalAttnBlock(block_in, num_groups=1, **kw)))
            down = _Container()
            down.block = nnx.List(block)
            down.attn = nnx.List(attn)
            if i_level != self.num_resolutions - 1:
                down.downsample = CausalHybridDownsample3d(
                    block_in, spatial_down=i_level < self.num_spatial_downs, temporal_down=i_level < self.num_temporal_downs, **kw
                )
                curr_res = curr_res // 2
            self.down.append(down)

        self.mid = _Container()
        self.mid.block_1 = CausalResnetBlockFactorized3d(in_channels=block_in, out_channels=block_in, dropout=dropout, num_groups=1, **kw)
        self.mid.attn_1 = Seq3d(CausalAttnBlock(block_in, num_groups=1, **kw), CausalTemporalAttnBlock(block_in, num_groups=1, **kw))
        self.mid.block_2 = CausalResnetBlockFactorized3d(in_channels=block_in, out_channels=block_in, dropout=dropout, num_groups=1, **kw)

        self.norm_out = CausalNormalize(block_in, num_groups=1, **kw)
        self.conv_out = Seq3d(
            CausalConv3d(block_in, z_channels, (1, 3, 3), stride=1, padding=1, **kw),
            CausalConv3d(z_channels, z_channels, (3, 1, 1), stride=1, padding=0, **kw),
        )

    def __call__(self, x):
        x = self.patcher3d(x)
        h = self.conv_in(x)
        for i_level in range(self.num_resolutions):
            down = self.down[i_level]
            for i_block in range(self.num_res_blocks):
                h = down.block[i_block](h)
                if len(down.attn) > 0:
                    h = down.attn[i_block](h)
            if i_level != self.num_resolutions - 1:
                h = down.downsample(h)
        h = self.mid.block_1(h)
        h = self.mid.attn_1(h)
        h = self.mid.block_2(h)
        return self.conv_out(nonlinearity(self.norm_out(h)))


class DecoderFactorized(nnx.Module):
    "Factorized causal video decoder (layers3d.py:832-965). (B,C,T,H,W) API."

    def __init__(
        self,
        out_channels: int,
        channels: int,
        channels_mult: List[int],
        num_res_blocks: int,
        attn_resolutions: List[int],
        dropout: float,
        resolution: int,
        z_channels: int,
        spatial_compression: int = 16,
        temporal_compression: int = 8,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs=None,
        **ignore_kwargs,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_resolutions = len(channels_mult)
        self.num_res_blocks = num_res_blocks

        patch_size = ignore_kwargs.get("patch_size", 1)
        self.unpatcher3d = UnPatcher3D(patch_size, ignore_kwargs.get("patch_method", "rearrange"))
        out_ch = out_channels * patch_size**3

        self.num_spatial_ups = int(math.log2(spatial_compression)) - int(math.log2(patch_size))
        self.num_temporal_ups = int(math.log2(temporal_compression)) - int(math.log2(patch_size))

        block_in = channels * channels_mult[self.num_resolutions - 1]
        curr_res = (resolution // patch_size) // 2 ** (self.num_resolutions - 1)

        self.conv_in = Seq3d(
            CausalConv3d(z_channels, block_in, (1, 3, 3), stride=1, padding=1, **kw),
            CausalConv3d(block_in, block_in, (3, 1, 1), stride=1, padding=0, **kw),
        )

        self.mid = _Container()
        self.mid.block_1 = CausalResnetBlockFactorized3d(in_channels=block_in, out_channels=block_in, dropout=dropout, num_groups=1, **kw)
        self.mid.attn_1 = Seq3d(CausalAttnBlock(block_in, num_groups=1, **kw), CausalTemporalAttnBlock(block_in, num_groups=1, **kw))
        self.mid.block_2 = CausalResnetBlockFactorized3d(in_channels=block_in, out_channels=block_in, dropout=dropout, num_groups=1, **kw)

        legacy_mode = ignore_kwargs.get("legacy_mode", False)
        ups = []
        for i_level in reversed(range(self.num_resolutions)):
            block, attn = [], []
            block_out = channels * channels_mult[i_level]
            for _ in range(num_res_blocks + 1):
                block.append(CausalResnetBlockFactorized3d(in_channels=block_in, out_channels=block_out, dropout=dropout, num_groups=1, **kw))
                block_in = block_out
                if curr_res in attn_resolutions:
                    attn.append(Seq3d(CausalAttnBlock(block_in, num_groups=1, **kw), CausalTemporalAttnBlock(block_in, num_groups=1, **kw)))
            up = _Container()
            up.block = nnx.List(block)
            up.attn = nnx.List(attn)
            if i_level != 0:
                i_level_reverse = self.num_resolutions - i_level - 1
                if legacy_mode:
                    temporal_up = i_level_reverse < self.num_temporal_ups
                else:
                    temporal_up = 0 < i_level_reverse < self.num_temporal_ups + 1
                spatial_up = temporal_up or (
                    i_level_reverse < self.num_spatial_ups and self.num_spatial_ups > self.num_temporal_ups
                )
                up.upsample = CausalHybridUpsample3d(block_in, spatial_up=spatial_up, temporal_up=temporal_up, **kw)
                curr_res = curr_res * 2
            ups.insert(0, up)
        self.up = nnx.List(ups)

        self.norm_out = CausalNormalize(block_in, num_groups=1, **kw)
        self.conv_out = Seq3d(
            CausalConv3d(block_in, out_ch, (1, 3, 3), stride=1, padding=1, **kw),
            CausalConv3d(out_ch, out_ch, (3, 1, 1), stride=1, padding=0, **kw),
        )

    def __call__(self, z):
        h = self.conv_in(z)
        h = self.mid.block_1(h)
        h = self.mid.attn_1(h)
        h = self.mid.block_2(h)
        for i_level in reversed(range(self.num_resolutions)):
            up = self.up[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = up.block[i_block](h)
                if len(up.attn) > 0:
                    h = up.attn[i_block](h)
            if i_level != 0:
                h = up.upsample(h)
        h = self.conv_out(nonlinearity(self.norm_out(h)))
        return self.unpatcher3d(h)
