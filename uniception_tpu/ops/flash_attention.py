"""
Flash attention as a Pallas TPU kernel.

TPU-native replacement for the reference's use of
``F.scaled_dot_product_attention`` (uniception/models/utils/
transformer_blocks.py:243-246 and libs/croco/blocks.py:122-126).

FlashAttention-2 style single-pass softmax with running (max, sum) statistics
(Dao 2023, arXiv:2307.08691): the score matrix is never materialized in HBM;
each (query-block x key-block) tile lives in VMEM, accumulation is fp32, and
the MXU does both the QK^T and PV matmuls.

Public layout: (B, N, H, D); internally the kernel runs on (B, H, N, D) so
the blocked axes are the trailing (tokens, head-dim) pair, matching the TPU
tiling constraint (last two block dims aligned to (8, 128) or full).
Arbitrary sequence lengths are handled by padding to the block size and
masking padded keys with -inf before the softmax.

Backward currently recomputes attention through the XLA path (see
``_fa_bwd``); a Pallas backward kernel is a later optimization.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1e30


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, kv_len, block_k, precision):
    """One (q-block, k-block) step.

    q_ref: (1, 1, BQ, D); k_ref/v_ref: (1, 1, BK, D); o_ref: (1, 1, BQ, D).
    Scratch: m/l (BQ, 1) fp32, acc (BQ, D) fp32 — carried across the k axis.
    """
    k_idx = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # (BQ, D)
    k = k_ref[0, 0]  # (BK, D)
    v = v_ref[0, 0]  # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    )  # (BQ, BK)
    s = s * scale

    # mask out padded keys
    if kv_len % block_k != 0:
        start = k_idx * block_k
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1) + start
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:]  # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # (BQ, BK) fp32
    corr = jnp.exp(m_prev - m_new)  # (BQ, 1)

    l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    )  # (BQ, D)
    acc_scr[:] = acc_scr[:] * corr + pv
    m_scr[:] = m_new

    @pl.when(k_idx == num_k - 1)
    def _finalize():
        out = acc_scr[:] / l_scr[:]
        o_ref[0, 0] = out.astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, scale=None, block_q: int = 1024, block_k: int = 1024):
    """Flash attention over (B, N, H, D) tensors (non-causal, no mask).

    Args:
        q: (B, Nq, H, D); k, v: (B, Nk, H, D).
        scale: softmax scale (default D**-0.5).
        block_q/block_k: VMEM tile sizes along the query/key token axes.

    Returns:
        (B, Nq, H, D) attention output in q's dtype.
    """
    return _flash_attention_impl(q, k, v, scale, block_q, block_k)


def _flash_attention_impl(q, k, v, scale, block_q, block_k):
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    if scale is None:
        scale = D**-0.5

    bq = min(block_q, _round_up(Nq, 8))
    bk = min(block_k, _round_up(Nk, 8))
    nq_pad = _round_up(Nq, bq)
    nk_pad = _round_up(Nk, bk)

    # (B, N, H, D) -> (B, H, N, D): the token axis must be a blocked trailing axis.
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if nq_pad != Nq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, nq_pad - Nq), (0, 0)))
    if nk_pad != Nk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, nk_pad - Nk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, nk_pad - Nk), (0, 0)))

    grid = (B, H, nq_pad // bq, nk_pad // bk)

    # fp32 inputs get full-precision MXU passes (parity-grade); bf16 runs at
    # native MXU precision.
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT

    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, kv_len=Nk, block_k=bk, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, nq, nk: (b, h, nq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, nq, nk: (b, h, nk, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, nq, nk: (b, h, nk, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, nq, nk: (b, h, nq, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, nq_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * D,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
    )(qt, kt, vt)

    return jnp.transpose(out[:, :, :Nq], (0, 2, 1, 3))


def _fa_fwd(q, k, v, scale, block_q, block_k):
    return _flash_attention_impl(q, k, v, scale, block_q, block_k), (q, k, v)


def _fa_bwd(scale, block_q, block_k, res, g):
    # Backward through the XLA attention recompute; gradients match the
    # Pallas forward to numerical precision (same math, fp32 softmax).
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: jax.nn.dot_product_attention(q_, k_, v_, scale=scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
