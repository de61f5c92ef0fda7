"""
Zero-runtime-cost weight transforms for the int8 serving path:
SmoothQuant-style scale migration + QuaRot-style Hadamard rotations.

Both transforms are exact fp32 identities on the network function — they
rewrite weights (and the adjacent LayerNorm affine) so the COMPILED int8
program is unchanged (same kernels, same per-output-channel scale layout,
same dynamic per-token activation quant) while the quantization error
drops. They compose with GPTQ (nn/gptq.py) the same way GPTQ composes
with RTN: better numbers into the same serving artifact.

Scale migration (SmoothQuant, Xiao et al. 2023): per-input-channel scale
``s`` moved across a quantized linear's input boundary, folded EXACTLY
into the donor that produces that input:

    * ``attn.qkv``        <- the block's ``norm1`` affine (scale/bias / s)
    * ``mlp.fc1``         <- ``norm2`` (self blocks) / ``norm3`` (cross)
    * ``cross_attn.projq``<- ``norm2`` (cross blocks)
    * ``cross_attn.projk/projv`` <- ``norm_y`` (shared input => shared s)
    * ``attn.proj``       <- the v output columns of ``attn.qkv``
      (attention output is linear in v, so scaling v's output channels
      rescales proj's input channels exactly)
    * ``cross_attn.proj`` <- ``cross_attn.projv`` output columns
    * ``mlp.fc2`` has NO exact zero-cost donor: GELU does not commute with
      per-channel scaling (GELU(a)/s != GELU(a/s)), so fc2 is left alone.

``alpha`` interpolates whose outliers the scale chases:
``s_j = amax_x(j)^alpha / amax_w(j)^(1-alpha)`` — alpha=1 equalizes
activation channels (classic SmoothQuant: act error -> weight error),
alpha=0 equalizes weight ROWS (cross-layer equalization, Nagel et al.
2019: weight error -> act error). The serving bill here is WEIGHT-quant
dominated (BASELINE.md round 4), so small alpha is the interesting end.

Hadamard rotation (QuaRot, Ashkboos et al. 2024): a per-head orthogonal
``R = H_d . diag(+-1)`` inserted as ``R R^T = I`` between the v projection
and the output projection (the one pair in a ViT block with NO
nonlinearity, RoPE, or normalization between): v output columns are
rotated by R, proj input rows by R^T. Rotation spreads weight outliers
across the head's channels (entries become ~Gaussian), shrinking the
per-output-channel quant scales. q/k do NOT get this: RoPE sits between
their projections and the dot product and does not commute with R.

Composition with GPTQ: transforms change some layers' input distributions
deterministically (x -> x/s, x -> x @ R), so calibrated Hessians transform
analytically — pass ``hessians`` to the apply functions and they update
the affected entries in place (D^-1 H D^-1, B^T H B); everything else is
bit-identical (block inputs/outputs are unchanged), so ONE capture run
serves every transform variant.

The reference has no quantization story (pure fp32/autocast torch,
uniception/models/factory/dust3r.py:309); this extends the TPU-native
int8 serving stack (nn/quant.py, nn/gptq.py). Measured bills:
scripts/quant_transforms.py, recorded in BASELINE.md round 5.
"""

from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.nn.blocks import Attention, CrossAttention, CrossAttentionBlock, SelfAttentionBlock
from uniception_tpu.nn.quant import Int8Linear, _maybe_children

__all__ = [
    "hadamard",
    "head_rotation",
    "smooth_trunk",
    "rotate_trunk",
]


def hadamard(n: int) -> np.ndarray:
    "Normalized (orthogonal) Hadamard matrix of power-of-two order n (Sylvester)."
    if n & (n - 1):
        raise ValueError(f"Hadamard order must be a power of 2, got {n}")
    H = np.ones((1, 1), np.float64)
    while H.shape[0] < n:
        H = np.block([[H, H], [H, -H]])
    return H / np.sqrt(n)


def head_rotation(head_dim: int, seed: int = 0) -> np.ndarray:
    """The per-head rotation ``R = H_d . diag(+-1)``: Hadamard times a
    seeded random sign diagonal (the QuaRot recipe — the signs break the
    Hadamard's structured alignment with any particular weight pattern).
    Deterministic in ``seed`` so serve-side reconstruction is exact."""
    signs = np.where(np.random.RandomState(seed).rand(head_dim) < 0.5, -1.0, 1.0)
    return hadamard(head_dim) * signs  # columns signed: H @ diag(signs)


# ---------------------------------------------------------------------------
# walking


def _iter_blocks(module, _path=""):
    "Yield (loop_path, block, stacked_depth|None) for every standard block (incl. the root)."
    if isinstance(module, (SelfAttentionBlock, CrossAttentionBlock)):
        yield _path, module, getattr(module, "stacked_depth", None)
        return
    for _, name, child in _maybe_children(module):
        p = f"{_path}.{name}".lstrip(".")
        if isinstance(child, (SelfAttentionBlock, CrossAttentionBlock)):
            # Diff* subclasses reuse the block classes but carry their own
            # attention internals; the isinstance(attn, ...) gates below skip those
            yield p, child, getattr(child, "stacked_depth", None)
        elif isinstance(child, (nnx.Module, list, nnx.List)) and not isinstance(child, Int8Linear):
            yield from _iter_blocks(child, p)


def _key(block_path: str, rel: str) -> str:
    return f"{block_path}.{rel}".lstrip(".")


def _stat(stats: Dict[str, np.ndarray], block_path: str, depth: Optional[int], rel: str):
    """Stats for ``block.rel`` — loop key ``{block_path}.{rel}``, or the
    per-depth keys ``{block_path}.{i}.{rel}`` stacked for a scan block."""
    if depth is None:
        v = stats.get(_key(block_path, rel))
        return None if v is None else np.asarray(v, np.float64)
    keys = [_key(block_path, f"{i}.{rel}") for i in range(depth)]
    if not all(k in stats for k in keys):
        return None
    return np.stack([np.asarray(stats[k], np.float64) for k in keys])


def _hessian_scale(hessians, block_path, depth, rel, s):
    "In-place H <- D^-1 H D^-1 for the loop-layout Hessian entries of a target."
    if hessians is None:
        return
    if depth is None:
        k = _key(block_path, rel)
        if k in hessians:
            inv = 1.0 / np.asarray(s, np.float64)
            hessians[k] = hessians[k] * np.outer(inv, inv)
        return
    for i in range(depth):
        k = _key(block_path, f"{i}.{rel}")
        if k in hessians:
            inv = 1.0 / np.asarray(s[i], np.float64)
            hessians[k] = hessians[k] * np.outer(inv, inv)


def _hessian_rotate(hessians, block_path, depth, rel, R, num_heads):
    "In-place H <- B^T H B with B = blockdiag(R x num_heads) for a target."
    if hessians is None:
        return
    D = R.shape[0]

    def rot(H):
        d = H.shape[0]
        assert d == num_heads * D, (d, num_heads, D)
        Hb = H.reshape(num_heads, D, num_heads, D)
        Hb = np.einsum("da,hdje,eb->hajb", R, Hb, R, optimize=True)
        return Hb.reshape(d, d)

    keys = [_key(block_path, rel)] if depth is None else [_key(block_path, f"{i}.{rel}") for i in range(depth)]
    for k in keys:
        if k in hessians:
            hessians[k] = rot(hessians[k])


# ---------------------------------------------------------------------------
# parameter folds (all shapes carry an optional leading depth axis)


def _scales(amax_x: np.ndarray, kernel: jnp.ndarray, alpha: float) -> jnp.ndarray:
    "s_j = amax_x_j^alpha / amax_w_j^(1-alpha), guarded for dead channels."
    aw = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=-1)  # (..., in)
    ax = jnp.asarray(amax_x, jnp.float32)
    s = jnp.power(jnp.maximum(ax, 1e-12), alpha) / jnp.power(jnp.maximum(aw, 1e-12), 1.0 - alpha)
    s = jnp.where((ax > 0) & (aw > 0), s, 1.0)
    return jnp.clip(s, 1e-5, 1e5)


def _fold_into_norm(norm, lin: nnx.Linear, s: jnp.ndarray) -> bool:
    "x/s into the donor LayerNorm affine, s into the linear's input rows. Exact."
    if not isinstance(norm, nnx.LayerNorm) or norm.scale is None:
        return False
    lin.kernel[...] = (lin.kernel[...].astype(jnp.float32) * s[..., :, None]).astype(lin.kernel[...].dtype)
    norm.scale[...] = (norm.scale[...].astype(jnp.float32) / s).astype(norm.scale[...].dtype)
    if norm.bias is not None:
        norm.bias[...] = (norm.bias[...].astype(jnp.float32) / s).astype(norm.bias[...].dtype)
    return True


def _fold_v_to_proj(v_lin: nnx.Linear, v_slice, proj: nnx.Linear, t: jnp.ndarray) -> None:
    """v output columns (``v_slice`` of ``v_lin``'s output axis) scaled by
    1/t, proj input rows by t. Attention output is linear in v => exact."""
    k = v_lin.kernel[...].astype(jnp.float32)
    k = k.at[..., :, v_slice].divide(t[..., None, :])
    v_lin.kernel[...] = k.astype(v_lin.kernel[...].dtype)
    if v_lin.bias is not None:
        b = v_lin.bias[...].astype(jnp.float32)
        b = b.at[..., v_slice].divide(t)
        v_lin.bias[...] = b.astype(v_lin.bias[...].dtype)
    proj.kernel[...] = (proj.kernel[...].astype(jnp.float32) * t[..., :, None]).astype(proj.kernel[...].dtype)


def _rotate_v_to_proj(v_lin: nnx.Linear, v_start: int, proj: nnx.Linear, R: np.ndarray, num_heads: int) -> None:
    "Per-head R on v output columns, R^T on proj input rows. v_start offsets into v_lin's output axis."
    D = R.shape[0]
    inner = num_heads * D
    Rj = jnp.asarray(R, jnp.float32)

    k = v_lin.kernel[...].astype(jnp.float32)
    lead = k.shape[:-1]  # (..., in)
    v = k[..., v_start : v_start + inner].reshape(*lead, num_heads, D)
    v = jnp.einsum("...hd,de->...he", v, Rj)
    k = k.at[..., v_start : v_start + inner].set(v.reshape(*lead, inner))
    v_lin.kernel[...] = k.astype(v_lin.kernel[...].dtype)
    if v_lin.bias is not None:
        b = v_lin.bias[...].astype(jnp.float32)
        bl = b.shape[:-1]
        bv = b[..., v_start : v_start + inner].reshape(*bl, num_heads, D)
        bv = jnp.einsum("...hd,de->...he", bv, Rj)
        b = b.at[..., v_start : v_start + inner].set(bv.reshape(*bl, inner))
        v_lin.bias[...] = b.astype(v_lin.bias[...].dtype)

    pk = proj.kernel[...].astype(jnp.float32)  # (..., inner, out)
    lead, out = pk.shape[:-2], pk.shape[-1]
    pv = pk.reshape(*lead, num_heads, D, out)
    pv = jnp.einsum("ed,...hec->...hdc", Rj, pv)  # rows <- R^T rows
    proj.kernel[...] = pv.reshape(*lead, inner, out).astype(proj.kernel[...].dtype)


# ---------------------------------------------------------------------------
# public transforms


def smooth_trunk(
    model: nnx.Module,
    amax: Dict[str, np.ndarray],
    alpha: float = 0.25,
    hessians: Optional[Dict[str, np.ndarray]] = None,
) -> int:
    """Apply SmoothQuant-style scale migration to every standard block of a
    FLOAT model (loop or scan layout), in place. ``amax`` maps loop-layout
    linear paths to per-input-channel |x| maxima
    (``nn.gptq.harvest_act_amax``). Targets with no stats entry are
    skipped. Returns the number of folds applied. Call BEFORE
    ``quantize_trunk``; pass ``hessians`` to keep a captured Hessian dict
    consistent for a subsequent GPTQ pass."""
    folds = 0
    for path, block, depth in _iter_blocks(model):
        is_cross = isinstance(block, CrossAttentionBlock)

        # self-attn qkv <- norm1
        attn = block.attn
        if isinstance(attn, Attention) and not attn.latent_attn:
            ax = _stat(amax, path, depth, "attn.qkv")
            if ax is not None:
                s = _scales(ax, attn.qkv.kernel[...], alpha)
                if _fold_into_norm(block.norm1, attn.qkv, s):
                    _hessian_scale(hessians, path, depth, "attn.qkv", np.asarray(s))
                    folds += 1
            # attn.proj <- v columns of qkv
            ax = _stat(amax, path, depth, "attn.proj")
            if ax is not None:
                t = _scales(ax, attn.proj.kernel[...], alpha)
                inner = attn.num_heads * attn.head_dim
                _fold_v_to_proj(attn.qkv, slice(2 * inner, 3 * inner), attn.proj, t)
                _hessian_scale(hessians, path, depth, "attn.proj", np.asarray(t))
                folds += 1

        # mlp.fc1 <- norm2 (self) / norm3 (cross)
        mlp_norm = block.norm3 if is_cross else block.norm2
        if hasattr(block.mlp, "fc1") and isinstance(block.mlp.fc1, nnx.Linear):
            ax = _stat(amax, path, depth, "mlp.fc1")
            if ax is not None:
                s = _scales(ax, block.mlp.fc1.kernel[...], alpha)
                if _fold_into_norm(mlp_norm, block.mlp.fc1, s):
                    _hessian_scale(hessians, path, depth, "mlp.fc1", np.asarray(s))
                    folds += 1
        # mlp.fc2 deliberately untouched: GELU blocks an exact fold

        if is_cross and isinstance(block.cross_attn, CrossAttention):
            ca = block.cross_attn
            # projq <- norm2
            ax = _stat(amax, path, depth, "cross_attn.projq")
            if ax is not None:
                s = _scales(ax, ca.projq.kernel[...], alpha)
                if _fold_into_norm(block.norm2, ca.projq, s):
                    _hessian_scale(hessians, path, depth, "cross_attn.projq", np.asarray(s))
                    folds += 1
            # projk + projv <- norm_y (identical inputs => one shared scale,
            # computed against the concatenated kernels' row maxima)
            ax = _stat(amax, path, depth, "cross_attn.projv")
            if ax is not None and isinstance(block.norm_y, nnx.LayerNorm) and block.norm_y.scale is not None:
                kk = jnp.concatenate([ca.projk.kernel[...], ca.projv.kernel[...]], axis=-1)
                s = _scales(ax, kk, alpha)
                ca.projk.kernel[...] = (ca.projk.kernel[...].astype(jnp.float32) * s[..., :, None]).astype(
                    ca.projk.kernel[...].dtype
                )
                if _fold_into_norm(block.norm_y, ca.projv, s):
                    _hessian_scale(hessians, path, depth, "cross_attn.projv", np.asarray(s))
                    _hessian_scale(hessians, path, depth, "cross_attn.projk", np.asarray(s))
                    folds += 1
            # cross proj <- projv output columns
            ax = _stat(amax, path, depth, "cross_attn.proj")
            if ax is not None:
                t = _scales(ax, ca.proj.kernel[...], alpha)
                _fold_v_to_proj(ca.projv, slice(0, ca.num_heads * ca.head_dim), ca.proj, t)
                _hessian_scale(hessians, path, depth, "cross_attn.proj", np.asarray(t))
                folds += 1
    return folds


def rotate_trunk(
    model: nnx.Module,
    hessians: Optional[Dict[str, np.ndarray]] = None,
    seed: int = 0,
) -> int:
    """Insert the per-head Hadamard rotation into every standard block's
    v->proj pair (self and cross attention), in place on a FLOAT model
    (either layout). Deterministic in ``seed``. Returns rotations applied.
    Call BEFORE ``quantize_trunk`` (and after :func:`smooth_trunk` when
    composing — the Hessian updates compose in application order)."""
    done = 0
    for path, block, depth in _iter_blocks(model):
        attn = block.attn
        if isinstance(attn, Attention) and not attn.latent_attn and (attn.head_dim & (attn.head_dim - 1)) == 0:
            R = head_rotation(attn.head_dim, seed)
            inner = attn.num_heads * attn.head_dim
            _rotate_v_to_proj(attn.qkv, 2 * inner, attn.proj, R, attn.num_heads)
            _hessian_rotate(hessians, path, depth, "attn.proj", R, attn.num_heads)
            done += 1
        if isinstance(block, CrossAttentionBlock) and isinstance(block.cross_attn, CrossAttention):
            ca = block.cross_attn
            if (ca.head_dim & (ca.head_dim - 1)) == 0:
                R = head_rotation(ca.head_dim, seed)
                _rotate_v_to_proj(ca.projv, 0, ca.proj, R, ca.num_heads)
                _hessian_rotate(hessians, path, depth, "cross_attn.proj", R, ca.num_heads)
                done += 1
    return done
