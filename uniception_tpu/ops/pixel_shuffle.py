"""
Pixel shuffle / unshuffle with torch channel-ordering semantics.

Used by the Linear/MLP prediction heads (reference
uniception/models/prediction_heads/linear.py:82 uses F.pixel_shuffle) and
the dense-representation encoder (PixelUnshuffle). XLA lowers the
reshape+transpose pair to an efficient relayout.
"""

import jax.numpy as jnp

__all__ = ["pixel_shuffle", "pixel_unshuffle"]


def pixel_shuffle(x: jnp.ndarray, upscale_factor: int) -> jnp.ndarray:
    "(B, C*r^2, H, W) -> (B, C, H*r, W*r), torch F.pixel_shuffle ordering."
    r = upscale_factor
    B, C, H, W = x.shape
    c = C // (r * r)
    x = x.reshape(B, c, r, r, H, W)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(B, c, H * r, W * r)


def pixel_unshuffle(x: jnp.ndarray, downscale_factor: int) -> jnp.ndarray:
    "(B, C, H*r, W*r) -> (B, C*r^2, H, W), torch F.pixel_unshuffle ordering."
    r = downscale_factor
    B, C, Hr, Wr = x.shape
    H, W = Hr // r, Wr // r
    x = x.reshape(B, C, H, r, W, r)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(B, C * r * r, H, W)
