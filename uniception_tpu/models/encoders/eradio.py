"""
E-RADIO: efficient hybrid conv + windowed-attention trunk.

Capability-equivalent of the reference's E-RADIO path
(uniception/models/encoders/radio.py:95-98 + torch.hub NVlabs/RADIO
"e-radio_v2"). The actual E-RADIO network definition lives in the external
NVlabs hub repo (FasterViT-derived), not in the reference, so hub
checkpoints cannot be structurally mirrored offline; this module provides
the same encoder contract — `model(x) -> (summary, features (B, N, C))`
at stride `patch_size`, plus `set_optimal_window_size(image_shape)` — with
a TPU-first design:

    * conv stages run channels-last NHWC so XLA lowers them to MXU
      convolutions without layout transposes;
    * window attention is a static reshape to (B * num_windows, win*win)
      token blocks feeding the shared attention dispatch (Pallas/XLA);
    * the window size is a compile-time constant chosen by
      `set_optimal_window_size`, mirroring the reference's requirement to
      call it before tracing (radio.py:96-98).

Layout: stem /4 -> conv stage /8 -> conv stage /16 -> windowed-attention
stage /16 -> downsample /32 -> windowed-attention stage /32 -> upsample
and fuse back to /16 -> 1x1 proj to out_dim. Features are returned at
stride 16 like the ViT RADIO variants so the UniCeption encoder wrapper
(radio.py:129-136) reshapes them identically.
"""

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.ops.attention import scaled_dot_product_attention

__all__ = ["ERadio", "ERADIO_CONFIGS"]

ERADIO_CONFIGS = {
    # channels per stage, conv blocks, attn blocks, heads, output dim
    "e-radio_v2": dict(channels=(96, 192, 384, 768), conv_depths=(3, 3), attn_depths=(5, 5), num_heads=(12, 24), out_dim=1536),
    "e-radio_v2-test": dict(channels=(8, 16, 32, 64), conv_depths=(1, 1), attn_depths=(1, 1), num_heads=(2, 4), out_dim=48),
}


class _ConvBlock(nnx.Module):
    "ConvNeXt-style block: depthwise 7x7 -> LN -> pw expand -> GELU -> pw project, residual."

    def __init__(self, dim, *, dtype=None, param_dtype=jnp.float32, rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.dwconv = nnx.Conv(dim, dim, kernel_size=(7, 7), padding=3, feature_group_count=dim, **kw)
        self.norm = nnx.LayerNorm(dim, epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.pw1 = nnx.Linear(dim, 4 * dim, **kw)
        self.pw2 = nnx.Linear(4 * dim, dim, **kw)

    def __call__(self, x):
        h = self.pw2(jax.nn.gelu(self.pw1(self.norm(self.dwconv(x)))))
        return x + h


class _Downsample(nnx.Module):
    "LN + strided 2x2 conv (stage transition)."

    def __init__(self, cin, cout, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.norm = nnx.LayerNorm(cin, epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv = nnx.Conv(cin, cout, kernel_size=(2, 2), strides=(2, 2), dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        return self.conv(self.norm(x))


def _window_partition(x, win):
    "(B, H, W, C) -> (B * nH * nW, win*win, C); H, W must be divisible by win."
    B, H, W, C = x.shape
    x = x.reshape(B, H // win, win, W // win, win, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, win * win, C)


def _window_merge(x, win, H, W):
    B = x.shape[0] // ((H // win) * (W // win))
    x = x.reshape(B, H // win, W // win, win, win, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, x.shape[-1])


class _WindowAttnBlock(nnx.Module):
    "Pre-LN windowed attention + MLP, both residual. Tokens never leave VMEM-sized windows."

    def __init__(self, dim, num_heads, *, dtype=None, param_dtype=jnp.float32, rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.norm1 = nnx.LayerNorm(dim, epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.qkv = nnx.Linear(dim, 3 * dim, **kw)
        self.proj = nnx.Linear(dim, dim, **kw)
        self.norm2 = nnx.LayerNorm(dim, epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.fc1 = nnx.Linear(dim, 4 * dim, **kw)
        self.fc2 = nnx.Linear(4 * dim, dim, **kw)

    def __call__(self, x, win):
        B, H, W, C = x.shape
        t = _window_partition(self.norm1(x), win)  # (B*nw, L, C)
        qkv = self.qkv(t).reshape(t.shape[0], t.shape[1], 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = scaled_dot_product_attention(q, k, v)
        t = self.proj(attn.reshape(t.shape[0], t.shape[1], C))
        x = x + _window_merge(t, win, H, W)
        return x + self.fc2(jax.nn.gelu(self.fc1(self.norm2(x))))


class ERadio(nnx.Module):
    """Hybrid conv/windowed-attention encoder with the RADIO model contract.

    `__call__(x BCHW) -> (summary (B, out_dim), features (B, N, out_dim))`
    with N = (H/16)*(W/16), matching what encoders/radio.py:127-136 expects
    from the hub model.
    """

    def __init__(
        self,
        model_version: str = "e-radio_v2",
        in_chans: int = 3,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        cfg = ERADIO_CONFIGS[model_version]
        c1, c2, c3, c4 = cfg["channels"]
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.out_dim = cfg["out_dim"]
        self.window_size = 8  # default; overridden by set_optimal_window_size

        # stem: /4
        self.stem1 = nnx.Conv(in_chans, c1 // 2, kernel_size=(3, 3), strides=(2, 2), padding=1, **kw)
        self.stem2 = nnx.Conv(c1 // 2, c1, kernel_size=(3, 3), strides=(2, 2), padding=1, **kw)
        # conv stages: /4 -> /8 -> /16
        self.stage1 = nnx.List([_ConvBlock(c1, **kw) for _ in range(cfg["conv_depths"][0])])
        self.down1 = _Downsample(c1, c2, **kw)
        self.stage2 = nnx.List([_ConvBlock(c2, **kw) for _ in range(cfg["conv_depths"][1])])
        self.down2 = _Downsample(c2, c3, **kw)
        # attention stages: /16, /32
        self.stage3 = nnx.List([_WindowAttnBlock(c3, cfg["num_heads"][0], **kw) for _ in range(cfg["attn_depths"][0])])
        self.down3 = _Downsample(c3, c4, **kw)
        self.stage4 = nnx.List([_WindowAttnBlock(c4, cfg["num_heads"][1], **kw) for _ in range(cfg["attn_depths"][1])])
        # fuse /32 back into /16 and project to the RADIO feature dim
        self.up4 = nnx.ConvTranspose(c4, c3, kernel_size=(2, 2), strides=(2, 2), **kw)
        self.fuse_norm = nnx.LayerNorm(2 * c3, epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.head = nnx.Linear(2 * c3, self.out_dim, **kw)
        self.summary_norm = nnx.LayerNorm(self.out_dim, epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def set_optimal_window_size(self, image_shape: Tuple[int, int], max_window_size: int = 16):
        """Pick the largest window <= max that tiles the /32 feature grid exactly.

        Mirrors the reference requirement that E-RADIO's window size be fixed
        per input shape before the forward pass (radio.py:95-98). Must be
        called before tracing: the window is a static reshape constant.
        """
        h, w = image_shape[0] // 32, image_shape[1] // 32
        for win in range(min(max_window_size, h, w), 0, -1):
            if h % win == 0 and w % win == 0:
                self.window_size = win
                return win
        self.window_size = 1
        return 1

    def __call__(self, x):
        "x: (B, 3, H, W) with H, W divisible by 32 * window tiling."
        assert x.shape[2] % 32 == 0 and x.shape[3] % 32 == 0, (
            f"E-RADIO needs input H, W divisible by 32, got {x.shape[2:]}"
        )
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = self.stem2(jax.nn.gelu(self.stem1(x)))
        for blk in self.stage1:
            x = blk(x)
        x = self.down1(x)
        for blk in self.stage2:
            x = blk(x)
        x = self.down2(x)  # /16
        win16 = min(self.window_size * 2, x.shape[1], x.shape[2])
        for blk in self.stage3:
            x = blk(x, win16)
        x16 = x
        x = self.down3(x)  # /32
        for blk in self.stage4:
            x = blk(x, min(self.window_size, x.shape[1], x.shape[2]))
        x = self.up4(x)  # back to /16
        x = jnp.concatenate([x16, x], axis=-1)
        feats = self.head(self.fuse_norm(x))  # (B, H/16, W/16, out_dim)
        B, Hf, Wf, C = feats.shape
        tokens = feats.reshape(B, Hf * Wf, C)
        summary = self.summary_norm(tokens.mean(axis=1))
        return summary, tokens
