"""
Positional-encoding helpers shared by encoders.

Implements DINO-style bicubic PE interpolation with the historical
interpolate_offset=0.1 scale-factor kludge (reference:
encoders/patch_embedder.py:91-133, encoders/dense_rep_encoder.py:191-234,
torch.hub dinov2 interpolate_pos_encoding) and the sinusoid table used by
the dense-representation encoder (dense_rep_encoder.py:178-188).
"""

import math

import jax.numpy as jnp
import numpy as np

from uniception_tpu.ops.resize import interpolate

__all__ = ["interpolate_patch_pos_embed", "sinusoid_encoding_table"]


def interpolate_patch_pos_embed(
    patch_pos_embed: jnp.ndarray,
    h0: int,
    w0: int,
    interpolate_offset: float = 0.1,
    antialias: bool = False,
) -> jnp.ndarray:
    """Interpolate a (1, N, D) square-grid PE table to an (h0, w0) grid.

    Returns (1, h0*w0, D). Uses bicubic with torch's scale-factor source
    coordinates when interpolate_offset is set (the DINO kludge), matching
    the reference bit-for-bit.
    """
    n = patch_pos_embed.shape[1]
    m = int(math.sqrt(n))
    assert m * m == n, f"PE table is not square: {n}"
    if (h0, w0) == (m, m):
        return patch_pos_embed
    dim = patch_pos_embed.shape[-1]
    grid = jnp.transpose(patch_pos_embed.reshape(1, m, m, dim), (0, 3, 1, 2)).astype(jnp.float32)
    if interpolate_offset:
        sh = float(h0 + interpolate_offset) / m
        sw = float(w0 + interpolate_offset) / m
        out = interpolate(grid, scale_factor=(sh, sw), mode="bicubic", align_corners=False)
        assert out.shape[-2:] == (h0, w0)
    else:
        out = interpolate(grid, size=(h0, w0), mode="bicubic", align_corners=False)
    return jnp.transpose(out, (0, 2, 3, 1)).reshape(1, h0 * w0, dim).astype(patch_pos_embed.dtype)


def sinusoid_encoding_table(n_position: int, d_hid: int, base: float) -> np.ndarray:
    "Sinusoid PE table (dense_rep_encoder.py:178-188; base 70007 there)."
    position = np.arange(n_position)[:, None]
    hid = np.arange(d_hid)[None, :]
    angle = position / np.power(base, 2 * (hid // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)
