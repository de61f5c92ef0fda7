"""
Cosmos tokenizer continuous-2D layers (stable-diffusion style AE).

Behavioral parity with reference
uniception/models/libs/cosmos_tokenizer/modules/layers2d.py:38-331:
Upsample (nearest 2x + conv), Downsample (asymmetric zero-pad + stride-2
conv), ResnetBlock (GroupNorm-silu-conv x2 + nin shortcut), single-head
AttnBlock over flattened spatial tokens, and the Encoder/Decoder pyramids
with haar/rearrange patching.

All convs run NHWC internally; the public Encoder/Decoder API is BCHW like
the reference. State-dict keys match torch (down.{i}.block.{j}.*, mid.*, ...).
"""

import math
from typing import List

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.libs.cosmos_tokenizer.modules.patching import Patcher, UnPatcher
from uniception_tpu.nn.common import Identity
from uniception_tpu.nn.dpt_parts import Conv2dTorch
from uniception_tpu.ops.attention import scaled_dot_product_attention

__all__ = ["Upsample", "Downsample", "ResnetBlock", "AttnBlock", "Encoder", "Decoder"]


def nonlinearity(x):
    return x * jax.nn.sigmoid(x)  # silu (utils.py:57-58)


def Normalize(in_channels, num_groups=32, *, dtype=None, param_dtype=jnp.float32, rngs):
    return nnx.GroupNorm(in_channels, num_groups=num_groups, epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs)


class _Container(nnx.Module):
    "Anonymous torch nn.Module() attribute container."


class Upsample(nnx.Module):
    "Nearest 2x + 3x3 conv (layers2d.py:38-46). NHWC."

    def __init__(self, in_channels, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.conv = Conv2dTorch(in_channels, in_channels, 3, 1, 1, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return self.conv(x)


class Downsample(nnx.Module):
    "Asymmetric (0,1) zero-pad + stride-2 3x3 conv (layers2d.py:49-57). NHWC."

    def __init__(self, in_channels, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.conv = nnx.Conv(
            in_channels, in_channels, kernel_size=(3, 3), strides=(2, 2), padding="VALID",
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )

    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return self.conv(x)


class ResnetBlock(nnx.Module):
    "GN-silu-conv x2 with 1x1 nin shortcut (layers2d.py:60-97). NHWC."

    def __init__(self, *, in_channels, out_channels=None, dropout=0.0, dtype=None, param_dtype=jnp.float32, rngs):
        out_channels = in_channels if out_channels is None else out_channels
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = Normalize(in_channels, **kw)
        self.conv1 = Conv2dTorch(in_channels, out_channels, 3, 1, 1, **kw)
        self.norm2 = Normalize(out_channels, **kw)
        self.conv2 = Conv2dTorch(out_channels, out_channels, 3, 1, 1, **kw)
        self.nin_shortcut = (
            Conv2dTorch(in_channels, out_channels, 1, 1, 0, **kw) if in_channels != out_channels else Identity()
        )

    def __call__(self, x):
        h = self.conv1(nonlinearity(self.norm1(x)))
        h = self.conv2(nonlinearity(self.norm2(h)))
        return self.nin_shortcut(x) + h


class AttnBlock(nnx.Module):
    "Single-head spatial self-attention (layers2d.py:100-137). NHWC."

    def __init__(self, in_channels, *, dtype=None, param_dtype=jnp.float32, rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm = Normalize(in_channels, **kw)
        self.q = Conv2dTorch(in_channels, in_channels, 1, 1, 0, **kw)
        self.k = Conv2dTorch(in_channels, in_channels, 1, 1, 0, **kw)
        self.v = Conv2dTorch(in_channels, in_channels, 1, 1, 0, **kw)
        self.proj_out = Conv2dTorch(in_channels, in_channels, 1, 1, 0, **kw)

    def __call__(self, x):
        B, H, W, C = x.shape
        h_ = self.norm(x)
        q = self.q(h_).reshape(B, H * W, 1, C)
        k = self.k(h_).reshape(B, H * W, 1, C)
        v = self.v(h_).reshape(B, H * W, 1, C)
        h_ = scaled_dot_product_attention(q, k, v, scale=C**-0.5).reshape(B, H, W, C)
        return x + self.proj_out(h_)


class Encoder(nnx.Module):
    "Cosmos 2D encoder pyramid (layers2d.py:139-233). BCHW API."

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
        spatial_compression: int,
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

        self.num_downsamples = int(math.log2(spatial_compression)) - int(math.log2(patch_size))
        assert self.num_downsamples <= self.num_resolutions

        self.conv_in = Conv2dTorch(in_channels, channels, 3, 1, 1, **kw)

        curr_res = resolution // patch_size
        in_ch_mult = (1,) + tuple(channels_mult)
        self.down = nnx.List([])
        block_in = channels
        for i_level in range(self.num_resolutions):
            block = []
            attn = []
            block_in = channels * in_ch_mult[i_level]
            block_out = channels * channels_mult[i_level]
            for _ in range(self.num_res_blocks):
                block.append(ResnetBlock(in_channels=block_in, out_channels=block_out, dropout=dropout, **kw))
                block_in = block_out
                if curr_res in attn_resolutions:
                    attn.append(AttnBlock(block_in, **kw))
            down = _Container()
            down.block = nnx.List(block)
            down.attn = nnx.List(attn)
            if i_level < self.num_downsamples:
                down.downsample = Downsample(block_in, **kw)
                curr_res = curr_res // 2
            self.down.append(down)

        self.mid = _Container()
        self.mid.block_1 = ResnetBlock(in_channels=block_in, out_channels=block_in, dropout=dropout, **kw)
        self.mid.attn_1 = AttnBlock(block_in, **kw)
        self.mid.block_2 = ResnetBlock(in_channels=block_in, out_channels=block_in, dropout=dropout, **kw)

        self.norm_out = Normalize(block_in, **kw)
        self.conv_out = Conv2dTorch(block_in, z_channels, 3, 1, 1, **kw)

    def __call__(self, x):
        "x: (B, C, H, W) -> (B, z_channels, H/sc, W/sc)."
        x = self.patcher(x)
        h = jnp.transpose(x, (0, 2, 3, 1))  # NHWC

        h = self.conv_in(h)
        for i_level in range(self.num_resolutions):
            down = self.down[i_level]
            for i_block in range(self.num_res_blocks):
                h = down.block[i_block](h)
                if len(down.attn) > 0:
                    h = down.attn[i_block](h)
            if i_level < self.num_downsamples:
                h = down.downsample(h)

        h = self.mid.block_1(h)
        h = self.mid.attn_1(h)
        h = self.mid.block_2(h)

        h = self.conv_out(nonlinearity(self.norm_out(h)))
        return jnp.transpose(h, (0, 3, 1, 2))


class Decoder(nnx.Module):
    "Cosmos 2D decoder pyramid (layers2d.py:236-331). BCHW API."

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
        spatial_compression: int,
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

        self.num_upsamples = int(math.log2(spatial_compression)) - int(math.log2(patch_size))
        assert self.num_upsamples <= self.num_resolutions

        block_in = channels * channels_mult[self.num_resolutions - 1]
        curr_res = (resolution // patch_size) // 2 ** (self.num_resolutions - 1)

        self.conv_in = Conv2dTorch(z_channels, block_in, 3, 1, 1, **kw)

        self.mid = _Container()
        self.mid.block_1 = ResnetBlock(in_channels=block_in, out_channels=block_in, dropout=dropout, **kw)
        self.mid.attn_1 = AttnBlock(block_in, **kw)
        self.mid.block_2 = ResnetBlock(in_channels=block_in, out_channels=block_in, dropout=dropout, **kw)

        ups = []
        for i_level in reversed(range(self.num_resolutions)):
            block = []
            attn = []
            block_out = channels * channels_mult[i_level]
            for _ in range(self.num_res_blocks + 1):
                block.append(ResnetBlock(in_channels=block_in, out_channels=block_out, dropout=dropout, **kw))
                block_in = block_out
                if curr_res in attn_resolutions:
                    attn.append(AttnBlock(block_in, **kw))
            up = _Container()
            up.block = nnx.List(block)
            up.attn = nnx.List(attn)
            if i_level >= (self.num_resolutions - self.num_upsamples):
                up.upsample = Upsample(block_in, **kw)
                curr_res = curr_res * 2
            ups.insert(0, up)
        self.up = nnx.List(ups)

        self.norm_out = Normalize(block_in, **kw)
        self.conv_out = Conv2dTorch(block_in, out_ch, 3, 1, 1, **kw)

    def __call__(self, z):
        "z: (B, z_channels, h, w) -> (B, out_channels, H, W)."
        h = jnp.transpose(z, (0, 2, 3, 1))
        h = self.conv_in(h)

        h = self.mid.block_1(h)
        h = self.mid.attn_1(h)
        h = self.mid.block_2(h)

        for i_level in reversed(range(self.num_resolutions)):
            up = self.up[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = up.block[i_block](h)
                if len(up.attn) > 0:
                    h = up.attn[i_block](h)
            if i_level >= (self.num_resolutions - self.num_upsamples):
                h = up.upsample(h)

        h = self.conv_out(nonlinearity(self.norm_out(h)))
        return self.unpatcher(jnp.transpose(h, (0, 3, 1, 2)))
