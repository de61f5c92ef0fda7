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

__all__ = ["Patcher", "UnPatcher", "Patcher3D", "UnPatcher3D"]

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


_R3 = 1.0 / (2.0 * 2.0**0.5)  # 3D per-level rescale (patching.py:155)


def _dwt3(x, rescale=True):
    "(B, C, T, H, W) -> (B, 8C, T/2, H/2, W/2): [lll..hhh], letters = (t, h, w)."
    B, C, T, H, W = x.shape
    x = x.reshape(B, C, T // 2, 2, H // 2, 2, W // 2, 2)
    r = _R
    t0, t1 = x[:, :, :, 0], x[:, :, :, 1]
    tl, th = (t0 + t1) * r, (t0 - t1) * r  # (B, C, T/2, H/2, 2, W/2, 2)
    outs = []
    for tpart in (tl, th):
        h0, h1 = tpart[:, :, :, :, 0], tpart[:, :, :, :, 1]
        hl, hh = (h0 + h1) * r, (h0 - h1) * r  # (B, C, T/2, H/2, W/2, 2)
        for hpart in (hl, hh):
            w0, w1 = hpart[..., 0], hpart[..., 1]
            outs.append((w0 + w1) * r)
            outs.append((w0 - w1) * r)
    out = jnp.concatenate(outs, axis=1)
    if rescale:
        out = out / (2 * 2**0.5)
    return out


def _idwt3(x, rescale=True):
    "(B, 8C, T, H, W) -> (B, C, 2T, 2H, 2W): inverse of _dwt3."
    B, C8, T, H, W = x.shape
    C = C8 // 8
    parts = jnp.split(x, 8, axis=1)  # lll, llh, lhl, lhh, hll, hlh, hhl, hhh
    r = _R

    def inv_pair(a, b):
        "inverse butterfly along a new trailing axis of size 2"
        return jnp.stack([(a + b) * r, (a - b) * r], axis=-1)

    # W axis
    ll = inv_pair(parts[0], parts[1])  # (..., W, 2)
    lh = inv_pair(parts[2], parts[3])
    hl = inv_pair(parts[4], parts[5])
    hh = inv_pair(parts[6], parts[7])
    # H axis (insert before the W pair)
    l = jnp.stack([(ll + lh) * r, (ll - lh) * r], axis=4)  # (B,C,T,H,2,W,2)
    h = jnp.stack([(hl + hh) * r, (hl - hh) * r], axis=4)
    # T axis
    out = jnp.stack([(l + h) * r, (l - h) * r], axis=3)  # (B,C,T,2,H,2,W,2)
    out = out.reshape(B, C, 2 * T, 2 * H, 2 * W)
    if rescale:
        out = out * (2 * 2**0.5)
    return out


class Patcher3D(Patcher):
    "3D (un)patching for video: causal first-frame replication + 3D haar (patching.py:110-175)."

    def __call__(self, x):
        p = self.patch_size
        # replicate the first frame p times (causal init, patching.py:158-160)
        xi, xv = x[:, :, :1], x[:, :, 1:]
        x = jnp.concatenate([jnp.repeat(xi, p, axis=2), xv], axis=2)
        if self.patch_method == "haar":
            for _ in range(self.levels):
                x = _dwt3(x, rescale=True)
            return x
        if self.patch_method == "rearrange":
            B, C, T, H, W = x.shape
            x = x.reshape(B, C, T // p, p, H // p, p, W // p, p)
            x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))
            return x.reshape(B, C * p**3, T // p, H // p, W // p)
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


class UnPatcher3D(UnPatcher):
    "Inverse 3D (un)patching (patching.py:249-311)."

    def __call__(self, x):
        p = self.patch_size
        if self.patch_method == "haar":
            for _ in range(self.levels):
                x = _idwt3(x, rescale=True)
            return x[:, :, p - 1 :]
        if self.patch_method == "rearrange":
            B, Cp, T, H, W = x.shape
            C = Cp // p**3
            x = x.reshape(B, C, p, p, p, T, H, W)
            x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))
            x = x.reshape(B, C, T * p, H * p, W * p)
            return x[:, :, p - 1 :]
        raise ValueError("Unknown patch method: " + self.patch_method)
