"""
2D Rotary Position Embedding (RoPE2D) for TPU.

Replaces the reference's native CUDA kernel
(reference: uniception/models/libs/croco/curope/kernels.cu:17-82 and the
pure-torch fallback uniception/models/libs/croco/pos_embed.py:109-155).

Canonical layout (identical math to BOTH reference implementations):
the per-head dim D is split into two halves [y-half | x-half]; each half
of size D/2 is further split into [u | v] quarters of size Q = D/4 and
rotated by angle ``pos * inv_freq`` where ``inv_freq[q] = F0 / base**(q/Q)``:

    out_u = u * cos - v * sin
    out_v = v * cos + u * sin

The y-half uses the token's y position, the x-half its x position. This is
exactly the CUDA kernel's ``[u_Y v_Y u_X v_X]`` quarter layout
(kernels.cu:39-41) and equals the torch fallback's per-half rotate-half.

The backward pass of a rotation is the rotation by -theta (the reference
implements backward by re-running the kernel with -F0, curope2d.py:23-28);
with the pure-jnp forward JAX autodiff produces exactly that, and the Pallas
kernel gets the same via ``jax.custom_vjp``.

Two implementations:
    * :func:`rope_2d` — pure jnp; XLA fuses the elementwise rotation into
      surrounding work. Used as the reference/fallback path.
    * :func:`rope_2d_pallas` — Pallas TPU kernel; fuses inv-freq/cos/sin
      computation and the rotation into one VMEM pass over the tokens.

All functions use the (B, N, H, D) token layout (batch, tokens, heads,
head-dim) — the TPU-native layout used throughout this library.
"""

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ["rope_2d", "rope_2d_pallas", "rope_precompute_cos_sin", "rope_2d_from_cos_sin", "Rope2D"]


def _inv_freq(quarter: int, base: float, f0: float, dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.arange(quarter, dtype=dtype)
    return f0 / jnp.power(jnp.asarray(base, dtype), q / quarter)


def rope_precompute_cos_sin(positions: jnp.ndarray, head_dim: int, base: float = 100.0, f0: float = 1.0):
    """Precompute (cos, sin) tables of shape (B, N, D/2) for y|x halves.

    positions: (B, N, 2) integer (y, x) patch positions.

    The returned tables cover the full head dim: the first D/4 entries are the
    y-angle table, tiled twice per half internally by :func:`rope_2d_from_cos_sin`.
    Layout: cos/sin of shape (B, N, 2, Q) where axis 2 indexes (y, x).
    """
    assert head_dim % 4 == 0, "head_dim must be a multiple of 4 for RoPE2D"
    quarter = head_dim // 4
    inv = _inv_freq(quarter, base, f0)
    # angles: (B, N, 2, Q)
    ang = positions.astype(jnp.float32)[..., None] * inv[None, None, None, :]
    return jnp.cos(ang), jnp.sin(ang)


def rope_2d_from_cos_sin(tokens: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply RoPE2D given precomputed (B, N, 2, Q) cos/sin tables.

    tokens: (B, N, H, D) with D = 4*Q. Returns same shape/dtype.
    """
    B, N, H, D = tokens.shape
    Q = D // 4
    dt = tokens.dtype
    # (B, N, 1, 2, 2, Q): halves (y,x) x (u,v) x quarter
    t = tokens.reshape(B, N, H, 2, 2, Q)
    u = t[..., 0, :]
    v = t[..., 1, :]
    c = cos[:, :, None, :, :].astype(dt)  # (B, N, 1, 2, Q)
    s = sin[:, :, None, :, :].astype(dt)
    out_u = u * c - v * s
    out_v = v * c + u * s
    out = jnp.stack([out_u, out_v], axis=-2)
    return out.reshape(B, N, H, D)


def rope_2d(tokens: jnp.ndarray, positions: jnp.ndarray, base: float = 100.0, f0: float = 1.0) -> jnp.ndarray:
    """Pure-jnp RoPE2D.

    tokens: (B, N, H, D); positions: (B, N, 2) int (y, x). Returns (B, N, H, D).
    """
    cos, sin = rope_precompute_cos_sin(positions, tokens.shape[-1], base=base, f0=f0)
    return rope_2d_from_cos_sin(tokens, cos, sin)


# ----------------------------------------------------------------------------
# Pallas TPU kernel
# ----------------------------------------------------------------------------


def _rope_kernel(pos_ref, u_ref, v_ref, ou_ref, ov_ref, *, base: float, f0: float, quarter: int, num_heads: int):
    """Pallas kernel body: one grid step rotates a (block_n, H*D/2) u/v tile pair.

    The wrapper pre-separates each head's [u_Y v_Y u_X v_X] quarters
    (kernels.cu:39-41) into u = [head0: u_Y u_X | head1: ...] and
    v = [head0: v_Y v_X | ...], so the kernel is a pure fused
    cos/sin-compute + rotate over 2D tiles (Mosaic-friendly, no reshapes).
    """
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (1, quarter), dimension=1).astype(jnp.float32)
    inv = f0 / jnp.power(jnp.asarray(base, jnp.float32), q_idx / quarter)  # (1, Q)

    pos = pos_ref[0].astype(jnp.float32)  # (bn, 2)
    ang_y = pos[:, 0:1] * inv  # (bn, Q)
    ang_x = pos[:, 1:2] * inv
    ang = jnp.concatenate([ang_y, ang_x], axis=-1)  # (bn, 2Q) per-head angle table
    ang = jnp.concatenate([ang] * num_heads, axis=-1)  # (bn, H*2Q)

    u = u_ref[0]
    v = v_ref[0]
    c = jnp.cos(ang).astype(u.dtype)
    s = jnp.sin(ang).astype(u.dtype)
    ou_ref[0] = u * c - v * s
    ov_ref[0] = v * c + u * s


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rope_2d_pallas(tokens: jnp.ndarray, positions: jnp.ndarray, base: float = 100.0, f0: float = 1.0):
    """Pallas-TPU RoPE2D with custom VJP (backward = rotation by -theta).

    tokens: (B, N, H, D); positions: (B, N, 2). Returns rotated tokens.
    """
    return _rope_2d_pallas_impl(tokens, positions, base, f0)


def _rope_2d_pallas_impl(tokens, positions, base, f0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, H, D = tokens.shape
    assert D % 4 == 0, "head dim must be a multiple of 4"
    quarter = D // 4
    hd2 = H * D // 2

    # Tile over tokens; lanes = H*D/2 (a multiple of 128 for all real configs).
    # Pad the token axis to the block size; padded rows are sliced off below.
    block_n = min(256, -(-N // 8) * 8)
    n_pad = -(-N // block_n) * block_n

    # Separate u/v quarters: (B, N, H, 2, 2, Q) where axes are
    # (half y|x, u|v, quarter) -> u/v each (B, N, H*2Q).
    t = tokens.reshape(B, N, H, 2, 2, quarter)
    u = t[:, :, :, :, 0, :].reshape(B, N, hd2)
    v = t[:, :, :, :, 1, :].reshape(B, N, hd2)
    if n_pad != N:
        pad = ((0, 0), (0, n_pad - N), (0, 0))
        u, v, positions = jnp.pad(u, pad), jnp.pad(v, pad), jnp.pad(positions, pad)
    grid = (B, n_pad // block_n)

    tile = lambda lanes: pl.BlockSpec((1, block_n, lanes), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM)
    ou, ov = pl.pallas_call(
        functools.partial(_rope_kernel, base=float(base), f0=float(f0), quarter=quarter, num_heads=H),
        grid=grid,
        in_specs=[tile(2), tile(hd2), tile(hd2)],
        out_specs=(tile(hd2), tile(hd2)),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_pad, hd2), tokens.dtype),
            jax.ShapeDtypeStruct((B, n_pad, hd2), tokens.dtype),
        ),
    )(positions, u, v)

    ou = ou[:, :N].reshape(B, N, H, 2, 1, quarter)
    ov = ov[:, :N].reshape(B, N, H, 2, 1, quarter)
    return jnp.concatenate([ou, ov], axis=-2).reshape(B, N, H, D)


def _rope_pallas_fwd(tokens, positions, base, f0):
    return _rope_2d_pallas_impl(tokens, positions, base, f0), positions


def _rope_pallas_bwd(base, f0, positions, g):
    # rotation transpose == rotation by -theta (reference: curope2d.py:23-28 uses -F0)
    return _rope_2d_pallas_impl(g, positions, base, -f0), None


rope_2d_pallas.defvjp(_rope_pallas_fwd, _rope_pallas_bwd)


class Rope2D:
    """RoPE2D callable matching the reference module API (pos_embed.py:103-155).

    Instances are stateless (pure function of inputs) and can be shared across
    attention layers, mirroring how the reference shares one RoPE2D module.

    Call: tokens (B, N, H, D), positions (B, N, 2) -> rotated tokens.
    """

    def __init__(self, freq: float = 100.0, F0: float = 1.0, use_pallas: bool = False):
        self.base = float(freq)
        self.F0 = float(F0)
        self.use_pallas = use_pallas

    def __call__(self, tokens: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas:
            return rope_2d_pallas(tokens, positions, self.base, self.F0)
        return rope_2d(tokens, positions, base=self.base, f0=self.F0)
