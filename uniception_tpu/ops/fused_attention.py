"""
Fused qkv-projection + RoPE2D + flash-attention Pallas TPU kernel.

Motivation (measured, BASELINE.md): at ViT-L geometry the flash-attention
matmuls are capped at ~50% MXU utilization by the D=64 head dim, while the
qkv projection is a full-width (N,C)@(C,3C) matmul that runs near the chip
roofline — but in the unfused path it pays extra HBM round trips (qkv
write+read), lane-slicing of the (B,N,3,H,D) tensor, and a separate RoPE
pass. This kernel performs, per (batch, q-block) grid step:

    1. qkv_all = x @ Wqkv + b          (one full-MXU matmul)
    2. RoPE2D on the q/k halves        (elementwise, VPU, overlapped)
    3. per-head flash attention        (the D=64-bound part, unchanged math)

entirely in VMEM, writing only the pre-out-projection attention output
(B, N, H*D) back to HBM.

RoPE is applied on the reference's native ``[u_Y v_Y u_X v_X]`` quarter
layout (reference: uniception/models/libs/croco/curope/kernels.cu:39-41)
as ``t * cospat + swap_uv(t) * sinpat`` where ``swap_uv`` swaps the u/v
quarters (16-lane groups) and the u-half sign is folded into ``sinpat``.
No weight re-layout is needed, so checkpoints load unchanged.

Backward: ``jax.custom_vjp`` whose backward recomputes the forward through
the *unfused* composition (XLA matmul + jnp RoPE + the verified Pallas
flash-attention backward), i.e. gradient-checkpointing semantics — the
fused forward saves activation memory too.

Used by nn.blocks.Attention/CrossAttention when UNICEPTION_TPU_ATTN=fused.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uniception_tpu.ops.flash_attention import _interpret, _round_up

__all__ = ["fused_qkv_rope_attention", "fused_cross_rope_attention"]

NEG_INF = -1e30


def _rope_patterns(pos, quarter, num_heads, base, f0):
    """cos/sin lane patterns (bn, H*4Q) for the native quarter layout.

    pos: (bn, 2) float (y, x). Per head the pattern is
    cos: [cy cy cx cx], sin: [-sy sy -sx sx] (u-half sign folded in).
    """
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (1, quarter), 1).astype(jnp.float32)
    inv = f0 / jnp.power(jnp.asarray(base, jnp.float32), q_idx / quarter)  # (1, Q)
    ang_y = pos[:, 0:1] * inv
    ang_x = pos[:, 1:2] * inv
    cy, sy = jnp.cos(ang_y), jnp.sin(ang_y)
    cx, sx = jnp.cos(ang_x), jnp.sin(ang_x)
    chead = jnp.concatenate([cy, cy, cx, cx], axis=-1)  # (bn, 4Q)
    shead = jnp.concatenate([-sy, sy, -sx, sx], axis=-1)
    cpat = jnp.concatenate([chead] * num_heads, axis=-1)  # (bn, H*4Q)
    spat = jnp.concatenate([shead] * num_heads, axis=-1)
    return cpat, spat


def _swap_uv(t, quarter, num_heads):
    "Swap u/v quarters within each head: [uY vY uX vX] -> [vY uY vX uX]."
    parts = []
    for h in range(num_heads):
        o = h * 4 * quarter
        parts += [
            t[:, o + quarter : o + 2 * quarter],
            t[:, o : o + quarter],
            t[:, o + 3 * quarter : o + 4 * quarter],
            t[:, o + 2 * quarter : o + 3 * quarter],
        ]
    return jnp.concatenate(parts, axis=-1)


def _apply_rope(t, cpat, spat, quarter, num_heads):
    # cos/sin cast to the token dtype, matching rope_2d_from_cos_sin
    return t * cpat.astype(t.dtype) + _swap_uv(t, quarter, num_heads) * spat.astype(t.dtype)


def _attend_heads(q_all, k_all, v_all, o_ref, *, num_heads, head_dim, scale, kv_len, precision, out_dtype):
    "Per-head single-pass softmax attention; writes (bn_q, H*D) to o_ref[0]."
    mask_cols = kv_len != k_all.shape[0]
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_all[:, sl]
        k = k_all[:, sl]
        v = v_all[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
        ) * scale
        if mask_cols:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
        )
        o_ref[0, :, sl] = (pv / l).astype(out_dtype)


def _fused_self_kernel(
    x_ref, w_ref, b_ref, pos_ref, o_ref, kv_scr,
    *, num_heads, head_dim, scale, kv_len, precision, use_rope, base, f0, compute_dtype,
):
    """One (batch, q-block) step of fused qkv + rope + attention.

    x_ref: (1, bn, C); w_ref: (C, 3HD); b_ref: (1, 3HD); pos_ref: (1, bn, 2);
    o_ref: (1, bq, HD). kv_scr (persistent across q-blocks of one batch row):
    (2, bn_kv, HD) rotated k and v.

    The k/v projection + rope runs only on the first q-block of each batch
    row; q-blocks then attend against the scratch. When there is a single
    q-block (the common ViT case) this degenerates to one fused pass.
    """
    hd = num_heads * head_dim
    quarter = head_dim // 4
    q_idx = pl.program_id(1)

    x = x_ref[0]  # (bn, C)
    bq = o_ref.shape[1]
    single_q = x_ref.shape[1] == bq
    x_q = x if single_q else x_ref[0, pl.dslice(q_idx * bq, bq)]

    @pl.when(q_idx == 0)
    def _project_kv():
        kv = jax.lax.dot_general(
            x, w_ref[:, hd:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
        ) + b_ref[0, hd:]
        k_all = kv[:, :hd].astype(compute_dtype)
        if use_rope:
            cpat, spat = _rope_patterns(pos_ref[0].astype(jnp.float32), quarter, num_heads, base, f0)
            k_all = _apply_rope(k_all, cpat, spat, quarter, num_heads)
        kv_scr[0] = k_all
        kv_scr[1] = kv[:, hd:].astype(compute_dtype)

    qp = (jax.lax.dot_general(
        x_q, w_ref[:, :hd], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    ) + b_ref[0, :hd]).astype(compute_dtype)
    if use_rope:
        pos_q = pos_ref[0] if single_q else pos_ref[0, pl.dslice(q_idx * bq, bq)]
        cpat, spat = _rope_patterns(pos_q.astype(jnp.float32), quarter, num_heads, base, f0)
        qp = _apply_rope(qp, cpat, spat, quarter, num_heads)
    q_all = qp

    _attend_heads(
        q_all, kv_scr[0], kv_scr[1], o_ref,
        num_heads=num_heads, head_dim=head_dim, scale=scale, kv_len=kv_len,
        precision=precision, out_dtype=o_ref.dtype,
    )


def _fused_cross_kernel(
    xq_ref, xkv_ref, wq_ref, wkv_ref, bq_ref, bkv_ref, posq_ref, poskv_ref, o_ref, kv_scr,
    *, num_heads, head_dim, scale, kv_len, precision, use_rope, base, f0, compute_dtype,
):
    "Cross-attention variant: q from xq_ref, k/v from xkv_ref."
    hd = num_heads * head_dim
    quarter = head_dim // 4
    q_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _project_kv():
        kv = jax.lax.dot_general(
            xkv_ref[0], wkv_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
        ) + bkv_ref[0]
        k_all = kv[:, :hd].astype(compute_dtype)
        if use_rope:
            cpat, spat = _rope_patterns(poskv_ref[0].astype(jnp.float32), quarter, num_heads, base, f0)
            k_all = _apply_rope(k_all, cpat, spat, quarter, num_heads)
        kv_scr[0] = k_all
        kv_scr[1] = kv[:, hd:].astype(compute_dtype)

    qp = (jax.lax.dot_general(
        xq_ref[0], wq_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    ) + bq_ref[0]).astype(compute_dtype)
    if use_rope:
        cpat, spat = _rope_patterns(posq_ref[0].astype(jnp.float32), quarter, num_heads, base, f0)
        qp = _apply_rope(qp, cpat, spat, quarter, num_heads)
    q_all = qp

    _attend_heads(
        q_all, kv_scr[0], kv_scr[1], o_ref,
        num_heads=num_heads, head_dim=head_dim, scale=scale, kv_len=kv_len,
        precision=precision, out_dtype=o_ref.dtype,
    )


def _self_reference(x, wqkv, bqkv, positions, num_heads, scale, base, f0):
    "Unfused composition (used for the backward pass and as parity oracle)."
    from uniception_tpu.ops.attention import scaled_dot_product_attention
    from uniception_tpu.ops.rope import rope_2d

    B, N, C = x.shape
    qkv = (x @ wqkv + bqkv).reshape(B, N, 3, num_heads, -1)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if positions is not None:
        q = rope_2d(q, positions, base=base, f0=f0)
        k = rope_2d(k, positions, base=base, f0=f0)
    out = scaled_dot_product_attention(q, k, v, scale=scale)
    return out.reshape(B, N, -1)


def _cross_reference(xq, xkv, wq, wkv, bq, bkv, qpos, kpos, num_heads, scale, base, f0):
    from uniception_tpu.ops.attention import scaled_dot_product_attention
    from uniception_tpu.ops.rope import rope_2d

    B, Nq, _ = xq.shape
    Nk = xkv.shape[1]
    q = (xq @ wq + bq).reshape(B, Nq, num_heads, -1)
    kv = (xkv @ wkv + bkv).reshape(B, Nk, 2, num_heads, -1)
    k, v = kv[:, :, 0], kv[:, :, 1]
    if qpos is not None:
        q = rope_2d(q, qpos, base=base, f0=f0)
    if kpos is not None:
        k = rope_2d(k, kpos, base=base, f0=f0)
    out = scaled_dot_product_attention(q, k, v, scale=scale)
    return out.reshape(B, Nq, -1)


def _plan_fused(Nq, Nk, head_dim, dtype):
    "Pick q-block size and padded lengths. Lanes of the score tile = Nk."
    nk_pad = _round_up(Nk, 128)
    # score tile (bq, nk_pad) fp32 must stay comfortably in VMEM alongside
    # the projection operands; 1024 rows x 2048 cols fp32 = 8 MB worst case.
    bq = min(1024, _round_up(Nq, 8))
    nq_pad = _round_up(Nq, bq)
    compute_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    return bq, nq_pad, nk_pad, compute_dtype, precision


def _pad_rows(x, n_pad):
    return x if x.shape[1] == n_pad else jnp.pad(x, ((0, 0), (0, n_pad - x.shape[1]), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_qkv_rope_attention(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    positions: Optional[jnp.ndarray],
    num_heads: int,
    scale: float,
    base: float = 100.0,
    f0: float = 1.0,
) -> jnp.ndarray:
    """Fused self-attention: (x @ Wqkv + b) -> RoPE2D -> flash attention.

    Args:
        x: (B, N, C) block input (post-norm).
        wqkv: (C, 3*H*D) fused qkv kernel (nnx.Linear layout).
        bqkv: (3*H*D,) bias (pass zeros when qkv_bias=False).
        positions: (B, N, 2) int (y, x) RoPE positions, or None for no RoPE.
        num_heads: H. scale: softmax scale (SSMax/entropy pre-scales folded in).
        base/f0: RoPE frequency parameters.

    Returns:
        (B, N, H*D) attention output (pre out-projection), dtype of x.
    """
    return _fused_self_impl(x, wqkv, bqkv, positions, num_heads, scale, base, f0)


def _fused_self_impl(x, wqkv, bqkv, positions, num_heads, scale, base, f0):
    B, N, C = x.shape
    hd = wqkv.shape[1] // 3
    head_dim = hd // num_heads
    bq, nq_pad, nk_pad, compute_dtype, precision = _plan_fused(N, N, head_dim, x.dtype)
    n_pad = max(nq_pad, nk_pad)

    xp = _pad_rows(x, n_pad)
    use_rope = positions is not None
    pos = _pad_rows(positions, n_pad) if use_rope else jnp.zeros((B, n_pad, 2), jnp.int32)
    bqkv2 = bqkv.reshape(1, -1).astype(jnp.float32)

    grid = (B, nq_pad // bq)
    out = pl.pallas_call(
        functools.partial(
            _fused_self_kernel,
            num_heads=num_heads, head_dim=head_dim, scale=float(scale), kv_len=N,
            precision=precision, use_rope=use_rope, base=float(base), f0=float(f0),
            compute_dtype=compute_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * hd), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * hd), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 2), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nq_pad, hd), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, n_pad, hd), compute_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xp, wqkv, bqkv2, pos)
    return out[:, :N]


def _fused_self_fwd(x, wqkv, bqkv, positions, num_heads, scale, base, f0):
    out = _fused_self_impl(x, wqkv, bqkv, positions, num_heads, scale, base, f0)
    return out, (x, wqkv, bqkv, positions)


def _fused_self_bwd(num_heads, scale, base, f0, res, g):
    x, wqkv, bqkv, positions = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _self_reference(x_, w_, b_, positions, num_heads, scale, base, f0), x, wqkv, bqkv)
    dx, dw, db = vjp(g)
    return dx, dw, db, None


fused_qkv_rope_attention.defvjp(_fused_self_fwd, _fused_self_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_cross_rope_attention(
    xq: jnp.ndarray,
    xkv: jnp.ndarray,
    wq: jnp.ndarray,
    wkv: jnp.ndarray,
    bq: jnp.ndarray,
    bkv: jnp.ndarray,
    qpos: Optional[jnp.ndarray],
    kpos: Optional[jnp.ndarray],
    num_heads: int,
    scale: float,
    base: float = 100.0,
    f0: float = 1.0,
) -> jnp.ndarray:
    """Fused cross-attention: q = xq @ Wq, kv = xkv @ Wkv, RoPE, attention.

    wkv is the column-concatenation [Wk | Wv] (C, 2*H*D); RoPE positions may
    be None independently for q and k (both None or both set in practice).
    Returns (B, Nq, H*D) in xq's dtype.
    """
    return _fused_cross_impl(xq, xkv, wq, wkv, bq, bkv, qpos, kpos, num_heads, scale, base, f0)


def _fused_cross_impl(xq, xkv, wq, wkv, bq_, bkv_, qpos, kpos, num_heads, scale, base, f0):
    B, Nq, C = xq.shape
    Nk = xkv.shape[1]
    Ckv = xkv.shape[2]
    hd = wq.shape[1]
    head_dim = hd // num_heads
    bq, nq_pad, nk_pad, compute_dtype, precision = _plan_fused(Nq, Nk, head_dim, xq.dtype)

    xqp = _pad_rows(xq, nq_pad)
    xkvp = _pad_rows(xkv, nk_pad)
    use_rope = qpos is not None or kpos is not None
    posq = _pad_rows(qpos, nq_pad) if qpos is not None else jnp.zeros((B, nq_pad, 2), jnp.int32)
    poskv = _pad_rows(kpos, nk_pad) if kpos is not None else jnp.zeros((B, nk_pad, 2), jnp.int32)
    bq2 = bq_.reshape(1, -1).astype(jnp.float32)
    bkv2 = bkv_.reshape(1, -1).astype(jnp.float32)

    grid = (B, nq_pad // bq)
    out = pl.pallas_call(
        functools.partial(
            _fused_cross_kernel,
            num_heads=num_heads, head_dim=head_dim, scale=float(scale), kv_len=Nk,
            precision=precision, use_rope=use_rope, base=float(base), f0=float(f0),
            compute_dtype=compute_dtype,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, Ckv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hd), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ckv, 2 * hd), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * hd), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 2), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, 2), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nq_pad, hd), xq.dtype),
        scratch_shapes=[pltpu.VMEM((2, nk_pad, hd), compute_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xqp, xkvp, wq, wkv, bq2, bkv2, posq, poskv)
    return out[:, :Nq]


def _fused_cross_fwd(xq, xkv, wq, wkv, bq, bkv, qpos, kpos, num_heads, scale, base, f0):
    out = _fused_cross_impl(xq, xkv, wq, wkv, bq, bkv, qpos, kpos, num_heads, scale, base, f0)
    return out, (xq, xkv, wq, wkv, bq, bkv, qpos, kpos)


def _fused_cross_bwd(num_heads, scale, base, f0, res, g):
    xq, xkv, wq, wkv, bq, bkv, qpos, kpos = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, e, f: _cross_reference(a, b, c, d, e, f, qpos, kpos, num_heads, scale, base, f0),
        xq, xkv, wq, wkv, bq, bkv,
    )
    return (*vjp(g), None, None)


fused_cross_rope_attention.defvjp(_fused_cross_fwd, _fused_cross_bwd)
