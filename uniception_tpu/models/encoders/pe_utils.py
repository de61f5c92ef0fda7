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

__all__ = ["interpolate_patch_pos_embed", "sinusoid_encoding_table", "get_2d_sincos_pos_embed"]


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


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, n_cls_token: int = 0) -> np.ndarray:
    """2D sine-cosine positional embedding table (reference
    libs/croco/pos_embed.py:19-66): (n_cls_token + grid_size^2, embed_dim),
    halves encode grid_h then grid_w with base-10000 frequencies."""

    def one_axis(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    assert embed_dim % 2 == 0
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0).reshape(2, -1)
    emb = np.concatenate([one_axis(embed_dim // 2, grid[0]), one_axis(embed_dim // 2, grid[1])], axis=1)
    if n_cls_token > 0:
        emb = np.concatenate([np.zeros((n_cls_token, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)
