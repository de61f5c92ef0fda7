"""
Haar / rearrange (un)patching for the Cosmos tokenizer.

Behavioral parity with reference
uniception/models/libs/cosmos_tokenizer/modules/patching.py:39-249: the
"haar" method is a levelwise 2D Haar DWT with /2 rescaling per level
(output channel order [LL, LH, HL, HH], L/H over W first then H);
"rearrange" is pixel-unshuffle. For the 2-tap Haar kernel the reference's
grouped strided convs reduce to exact 2x2 block butterflies, implemented
here as reshapes + adds (bitwise-equivalent, XLA-fusable).
Operates on (B, C, H, W).
"""

import jax.numpy as jnp

from uniception_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

__all__ = ["Patcher", "UnPatcher"]

_R = 0.7071067811865476


def _dwt2(x, rescale=True):
    "(B, C, H, W) -> (B, 4C, H/2, W/2): [LL, LH, HL, HH]."
    B, C, H, W = x.shape
    x = x.reshape(B, C, H // 2, 2, W // 2, 2)
    w0, w1 = x[..., 0], x[..., 1]  # split along W pairs
    xl = (w0 + w1) * _R  # (B, C, H/2, 2, W/2) — axis 3 is the H pair
    xh = (w0 - w1) * _R
    ll = (xl[:, :, :, 0] + xl[:, :, :, 1]) * _R
    lh = (xl[:, :, :, 0] - xl[:, :, :, 1]) * _R
    hl = (xh[:, :, :, 0] + xh[:, :, :, 1]) * _R
    hh = (xh[:, :, :, 0] - xh[:, :, :, 1]) * _R
    out = jnp.concatenate([ll, lh, hl, hh], axis=1)
    if rescale:
        out = out / 2
    return out


def _idwt2(x, rescale=True):
    "(B, 4C, H, W) -> (B, C, 2H, 2W): inverse of _dwt2."
    B, C4, H, W = x.shape
    C = C4 // 4
    ll, lh, hl, hh = jnp.split(x, 4, axis=1)
    yl0 = (ll + lh) * _R  # H pair element 0 of the low-W band
    yl1 = (ll - lh) * _R
    yh0 = (hl + hh) * _R
    yh1 = (hl - hh) * _R
    yl = jnp.stack([yl0, yl1], axis=4)  # (B, C, H, W, 2) over the H pair
    yh = jnp.stack([yh0, yh1], axis=4)
    w0 = (yl + yh) * _R
    w1 = (yl - yh) * _R
    out = jnp.stack([w0, w1], axis=5)  # (B, C, H, W, 2(hpair), 2(wpair))
    out = jnp.transpose(out, (0, 1, 2, 4, 3, 5)).reshape(B, C, 2 * H, 2 * W)
    if rescale:
        out = out * 2
    return out


class Patcher:
    "Image -> patches (haar DWT levels or pixel-unshuffle)."

    def __init__(self, patch_size=1, patch_method="haar"):
        self.patch_size = patch_size
        self.patch_method = patch_method
        self.levels = max(0, patch_size.bit_length() - 1)

    def __call__(self, x):
        if self.patch_method == "haar":
            for _ in range(self.levels):
                x = _dwt2(x, rescale=True)
            return x
        if self.patch_method == "rearrange":
            # torch rearrange "b c (h p1) (w p2) -> b (c p1 p2) h w"
            B, C, H, W = x.shape
            p = self.patch_size
            x = x.reshape(B, C, H // p, p, W // p, p)
            x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
            return x.reshape(B, C * p * p, H // p, W // p)
        raise ValueError("Unknown patch method: " + self.patch_method)


class UnPatcher:
    "Patches -> image (inverse haar or pixel-shuffle)."

    def __init__(self, patch_size=1, patch_method="haar"):
        self.patch_size = patch_size
        self.patch_method = patch_method
        self.levels = max(0, patch_size.bit_length() - 1)

    def __call__(self, x):
        if self.patch_method == "haar":
            for _ in range(self.levels):
                x = _idwt2(x, rescale=True)
            return x
        if self.patch_method == "rearrange":
            B, Cp, H, W = x.shape
            p = self.patch_size
            C = Cp // (p * p)
            x = x.reshape(B, C, p, p, H, W)
            x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
            return x.reshape(B, C, H * p, W * p)
        raise ValueError("Unknown patch method: " + self.patch_method)
