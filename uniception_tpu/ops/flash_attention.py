"""
Flash attention as Pallas TPU kernels (forward + backward).

TPU-native replacement for the reference's use of
``F.scaled_dot_product_attention`` (uniception/models/utils/
transformer_blocks.py:243-246 and libs/croco/blocks.py:122-126).

FlashAttention-2 style single-pass softmax with running (max, sum)
statistics (Dao 2023, arXiv:2307.08691): the score matrix is never
materialized in HBM; each (query-block x key-block) tile lives in VMEM,
accumulation is fp32, and the MXU does both the QK^T and PV matmuls.

Public layout: (B, N, H, D); internally the kernels run on (B, H, N, D) so
the blocked axes are the trailing (tokens, head-dim) pair, matching the TPU
tiling constraint (last two block dims aligned to (8, 128) or full).
Arbitrary sequence lengths are handled by padding to the block size and
masking padded keys with -inf before the softmax.

Backward: Pallas dq and dk/dv kernels using the saved logsumexp (the
standard FA recurrence: p = exp(s - L); dv = p^T dO; ds = p * (dO V^T - D);
dq = ds K; dk = ds^T Q). Off-TPU (or with UNICEPTION_TPU_ATTN != pallas)
gradients fall back to an XLA recompute.
"""

import functools
import os
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1e30


def _interpret() -> bool:
    "UNICEPTION_TPU_PALLAS_INTERPRET=1 runs the kernels in interpret mode (CPU testing)."
    return os.environ.get("UNICEPTION_TPU_PALLAS_INTERPRET") == "1"


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *rest, scale, kv_len, block_k, precision, with_lse):
    """Forward step for one (q-block, k-block).

    q_ref: (1, 1, BQ, D); k_ref/v_ref: (1, 1, BK, D); o_ref: (1, 1, BQ, D);
    lse_ref (training only): (1, 1, BQ, 128) logsumexp broadcast over lanes.
    Scratch: m/l (BQ, 1) fp32, acc (BQ, D) fp32 — carried across k steps.
    """
    if with_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        lse_ref = None
        m_scr, l_scr, acc_scr = rest
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
        l_final = l_scr[:]
        o_ref[0, 0] = (acc_scr[:] / l_final).astype(o_ref.dtype)
        if with_lse:
            lse_block = jnp.broadcast_to(m_scr[:] + jnp.log(l_final), lse_ref.shape[2:])
            lse_ref[0, 0] = lse_block.astype(lse_ref.dtype)


def _fa_single_kernel(q_ref, k_ref, v_ref, o_ref, *rest, scale, kv_len, block_k, precision, with_lse):
    """Specialized step when one k-block covers all keys (bk == padded Nk).

    The running-stats machinery (scratch init/rescale/finalize) costs ~20%
    of kernel time at ViT geometries; with a single k iteration the softmax
    is exact in one pass and needs no scratch at all. Bit-identical to the
    multi-step kernel (measured diff 0.0 on chip).
    """
    lse_ref = rest[0] if with_lse else None
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    ) * scale
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    )
    o_ref[0, 0] = (pv / l).astype(o_ref.dtype)
    if with_lse:
        lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(l), lse_ref.shape[2:]).astype(lse_ref.dtype)


def _fa_single_kernel_int8(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_k, pv_int8):
    """Int8 single-k-step forward (SageAttention-style, inference only).

    Quantization happens INSIDE the kernel (no layout/host changes):
        * K smoothing: k -= mean_k(k). q·mean_k is constant per query row, so
          the softmax is invariant — this removes K outliers for free
          (valid only because all keys sit in this one block).
        * q: per-row symmetric int8 (row abs-max / 127).
        * k: per-block scalar int8 (post-smoothing abs-max / 127).
        * QK^T runs int8xint8->int32 on the MXU (2x the bf16 rate on v5e).
        * pv_int8: p in [0, 1] by construction -> p_q = round(p * 127);
          v per-block scalar int8; PV also int8 (dequant is one scalar).
          Otherwise PV stays bf16.

    The quantization itself is VPU work on (N, D) tiles — negligible next
    to the (BQ, BK) score math.
    """
    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (BK, D)
    if kv_len % block_k != 0:
        # exclude padded rows from the k statistics
        krow = jax.lax.broadcasted_iota(jnp.int32, k.shape, dimension=0)
        kvalid = krow < kv_len
        k_for_stats = jnp.where(kvalid, k, 0.0)
        k_mean = jnp.sum(k_for_stats, axis=0, keepdims=True) / kv_len
        k = jnp.where(kvalid, k - k_mean, 0.0)
    else:
        k = k - jnp.mean(k, axis=0, keepdims=True)

    qs = jnp.maximum(jnp.max(jnp.abs(q), axis=-1, keepdims=True), 1e-30) / 127.0  # (BQ, 1)
    q8 = jnp.round(q / qs).astype(jnp.int8)
    ks = jnp.maximum(jnp.max(jnp.abs(k)), 1e-30) / 127.0  # scalar
    k8 = jnp.round(k / ks).astype(jnp.int8)

    s32 = jax.lax.dot_general(q8, k8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * (qs * (ks * scale))  # (BQ, BK)

    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0, 0]
    if pv_int8:
        vf = v.astype(jnp.float32)
        vs = jnp.maximum(jnp.max(jnp.abs(vf)), 1e-30) / 127.0
        v8 = jnp.round(vf / vs).astype(jnp.int8)
        p8 = jnp.round(p * 127.0).astype(jnp.int8)
        pv32 = jax.lax.dot_general(p8, v8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        pv = pv32.astype(jnp.float32) * (vs / 127.0)
    else:
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    o_ref[0, 0] = (pv / l).astype(o_ref.dtype)


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
    out, _ = _flash_attention_impl(q, k, v, scale, block_q, block_k, with_lse=False)
    return out


def _plan(q, k, scale, block_q, block_k):
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    scale = D**-0.5 if scale is None else scale
    # shrink tiles for wide heads: the default 1024/1024 plan is sized for
    # D=64 (ViT); at e.g. D=512 (cosmos tokenizer mid-block single-head
    # attention) the q/k/v tiles + (bq, bk) score buffer exceed the 16 MB
    # VMEM scoped limit and Mosaic refuses to compile. Halve the blocks
    # until the working set fits a conservative budget.
    bq = min(block_q, _round_up(Nq, 8))
    bk = min(block_k, _round_up(Nk, 8))
    itemsize = 2 if q.dtype != jnp.float32 else 4

    def working_set(bq, bk):
        # double-buffered q/k/v tiles + fp32 scores and output accumulators
        return 2 * (bq + 2 * bk) * D * itemsize + bq * bk * 4 + bq * D * 4

    # Halved sizes are re-aligned to the 8-sublane tile: bq starts at
    # round_up(Nq, 8), which need not be a power of two (e.g. Nq=1032 ->
    # 1032//2=516, not sublane-aligned — Mosaic can refuse such blocks).
    while working_set(bq, bk) > 8 * 1024 * 1024 and (bq > 128 or bk > 128):
        if bq >= bk and bq > 128:
            bq = _round_up(bq // 2, 8)
        else:
            bk = _round_up(bk // 2, 8)
    return B, Nq, Nk, H, D, scale, bq, bk, _round_up(Nq, bq), _round_up(Nk, bk)


def _to_bhnd(x, n_pad):
    xt = jnp.transpose(x, (0, 2, 1, 3))
    if n_pad != x.shape[1]:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, n_pad - x.shape[1]), (0, 0)))
    return xt


def _flash_attention_impl(q, k, v, scale, block_q, block_k, with_lse=True):
    """Returns (out (B,Nq,H,D), lse (B,H,Nq_pad) fp32 or None).

    with_lse=False skips the logsumexp output entirely (inference path —
    saves a (B,H,Nq,128) fp32 write per call).
    """
    B, Nq, Nk, H, D, scale, bq, bk, nq_pad, nk_pad = _plan(q, k, scale, block_q, block_k)

    qt, kt, vt = _to_bhnd(q, nq_pad), _to_bhnd(k, nk_pad), _to_bhnd(v, nk_pad)
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    single_k = nk_pad == bk  # one k-block covers all keys -> scratch-free kernel

    out_specs = [pl.BlockSpec((1, 1, bq, D), lambda b, h, nq, nk=0: (b, h, nq, 0), memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((B, H, nq_pad, D), q.dtype)]
    if with_lse:
        out_specs.append(pl.BlockSpec((1, 1, bq, 128), lambda b, h, nq, nk=0: (b, h, nq, 0), memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((B, H, nq_pad, 128), jnp.float32))
    in_specs = [
        pl.BlockSpec((1, 1, bq, D), lambda b, h, nq, nk=0: (b, h, nq, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), lambda b, h, nq, nk=0: (b, h, nk, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, D), lambda b, h, nq, nk=0: (b, h, nk, 0), memory_space=pltpu.VMEM),
    ]
    cost = pl.CostEstimate(
        flops=4 * B * H * Nq * Nk * D,
        bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
        transcendentals=B * H * Nq * Nk,
    )

    if single_k:
        from uniception_tpu.models.utils.config import get_attention_quant

        quant = get_attention_quant() if not with_lse else "none"  # int8 is inference-only
        if quant in ("int8", "int8pv") and q.dtype != jnp.float32:
            kernel = functools.partial(
                _fa_single_kernel_int8, scale=scale, kv_len=Nk, block_k=bk, pv_int8=(quant == "int8pv")
            )
        else:
            kernel = functools.partial(
                _fa_single_kernel, scale=scale, kv_len=Nk, block_k=bk, precision=precision, with_lse=with_lse
            )
        results = pl.pallas_call(
            kernel,
            grid=(B, H, nq_pad // bq),
            in_specs=in_specs,
            out_specs=tuple(out_specs) if with_lse else out_specs[0],
            out_shape=tuple(out_shapes) if with_lse else out_shapes[0],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            cost_estimate=cost,
            interpret=_interpret(),
        )(qt, kt, vt)
    else:
        results = pl.pallas_call(
            functools.partial(_fa_kernel, scale=scale, kv_len=Nk, block_k=bk, precision=precision, with_lse=with_lse),
            grid=(B, H, nq_pad // bq, nk_pad // bk),
            in_specs=in_specs,
            out_specs=tuple(out_specs) if with_lse else out_specs[0],
            out_shape=tuple(out_shapes) if with_lse else out_shapes[0],
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=_interpret(),
        )(qt, kt, vt)

    if with_lse:
        out, lse = results
        return jnp.transpose(out[:, :, :Nq], (0, 2, 1, 3)), lse[..., 0]
    return jnp.transpose(results[:, :, :Nq], (0, 2, 1, 3)), None


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _fa_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr, *, scale, kv_len, block_k, precision):
    "dq = sum_k ds K with ds = p * (dO V^T - delta) * scale."
    k_idx = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]
    delta = delta_ref[0, 0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=precision) * scale
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + k_idx * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=precision)
    ds = p * (dp - delta) * scale  # (BQ, BK) fp32
    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    )

    @pl.when(k_idx == num_k - 1)
    def _fin():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _fa_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale, kv_len, block_k, precision):
    "dk/dv: grid (B, H, nk, nq) with q innermost; accumulate over q blocks."
    q_idx = pl.program_id(3)
    num_q = pl.num_programs(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]
    delta = delta_ref[0, 0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=precision) * scale
    k_block = pl.program_id(2)
    if kv_len % k.shape[0] != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + k_block * k.shape[0]
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)  # (BQ, BK)

    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    )  # (BK, D)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=precision)
    ds = p * (dp - delta) * scale  # (BQ, BK)
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    )  # (BK, D)

    @pl.when(q_idx == num_q - 1)
    def _fin():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _fa_bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dk_ref, dv_ref, *, scale, kv_len, precision):
    """Single-block fused backward: dq + dk + dv in ONE kernel.

    When one (bq, bk) block covers all tokens (the ViT trunk shapes:
    N=1024 at 512², N=196 at 224²), the separate dq and dkv kernels each
    recompute S = qk^T and dP = dO v^T — 7 matmul-equivalents total. Fusing
    shares those recomputes: 5 matmuls (S, dP, dQ, dK, dV), a 2/7 FLOP cut
    at identical numerics (same trick as the forward's single-k-step
    scratch-free kernel, BASELINE.md round 1).

    Padded q rows are harmless (do rows are zero → their dv/dk
    contributions vanish); padded k columns are masked to NEG_INF.
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]
    delta = delta_ref[0, 0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=precision) * scale
    if kv_len % k.shape[0] != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)  # (BQ, BK) fp32

    dv_ref[0, 0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    ).astype(dv_ref.dtype)  # (BK, D)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=precision)
    ds = p * (dp - delta) * scale  # (BQ, BK) fp32
    dq_ref[0, 0] = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    ).astype(dq_ref.dtype)  # (BQ, D)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=precision
    ).astype(dk_ref.dtype)  # (BK, D)


def _flash_attention_bwd_pallas(q, k, v, out, lse, g, scale, block_q, block_k):
    B, Nq, Nk, H, D, scale, bq, bk, nq_pad, nk_pad = _plan(q, k, scale, block_q, block_k)
    precision = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT

    qt, kt, vt = _to_bhnd(q, nq_pad), _to_bhnd(k, nk_pad), _to_bhnd(v, nk_pad)
    dot = _to_bhnd(g, nq_pad)
    outt = _to_bhnd(out, nq_pad)

    single_block = nq_pad == bq and nk_pad == bk
    # fused VMEM budget: two (bq, bk) fp32 buffers (p and dp/ds) dominate
    if single_block and 2 * bq * bk * 4 + 5 * max(bq, bk) * D * 4 <= 12 * 1024 * 1024:
        delta = jnp.sum(dot.astype(jnp.float32) * outt.astype(jnp.float32), axis=-1)
        delta_b = jnp.broadcast_to(delta[..., None], delta.shape + (128,))
        lse_pad = lse if lse.shape[-1] == nq_pad else jnp.pad(lse, ((0, 0), (0, 0), (0, nq_pad - lse.shape[-1])))
        lse_b = jnp.broadcast_to(lse_pad[..., None], lse_pad.shape + (128,))

        q_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
        k_spec = pl.BlockSpec((1, 1, bk, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
        stat_spec = pl.BlockSpec((1, 1, bq, 128), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_fa_bwd_fused_kernel, scale=scale, kv_len=Nk, precision=precision),
            grid=(B, H),
            in_specs=[q_spec, k_spec, k_spec, q_spec, stat_spec, stat_spec],
            out_specs=(q_spec, k_spec, k_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, H, nq_pad, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, nk_pad, D), k.dtype),
                jax.ShapeDtypeStruct((B, H, nk_pad, D), v.dtype),
            ),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
            interpret=_interpret(),
        )(qt, kt, vt, dot, lse_b, delta_b)
        dq = jnp.transpose(dq[:, :, :Nq], (0, 2, 1, 3))
        dk = jnp.transpose(dk[:, :, :Nk], (0, 2, 1, 3))
        dv = jnp.transpose(dv[:, :, :Nk], (0, 2, 1, 3))
        return dq, dk, dv

    # delta = rowsum(dO * O): (B, H, Nq_pad), broadcast over 128 lanes for tiling
    delta = jnp.sum(dot.astype(jnp.float32) * outt.astype(jnp.float32), axis=-1)
    delta_b = jnp.broadcast_to(delta[..., None], delta.shape + (128,))
    lse_pad = lse if lse.shape[-1] == nq_pad else jnp.pad(lse, ((0, 0), (0, 0), (0, nq_pad - lse.shape[-1])))
    lse_b = jnp.broadcast_to(lse_pad[..., None], lse_pad.shape + (128,))

    q_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, bq, 128), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, scale=scale, kv_len=Nk, block_k=bk, precision=precision),
        grid=(B, H, nq_pad // bq, nk_pad // bk),
        in_specs=[q_spec, k_spec, k_spec, q_spec, stat_spec, stat_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, nq_pad, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qt, kt, vt, dot, lse_b, delta_b)

    # dk/dv: swap loop order — block over k, iterate q
    q_spec2 = pl.BlockSpec((1, 1, bq, D), lambda b, h, j, i: (b, h, i, 0), memory_space=pltpu.VMEM)
    k_spec2 = pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i: (b, h, j, 0), memory_space=pltpu.VMEM)
    stat_spec2 = pl.BlockSpec((1, 1, bq, 128), lambda b, h, j, i: (b, h, i, 0), memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_dkv_kernel, scale=scale, kv_len=Nk, block_k=bk, precision=precision),
        grid=(B, H, nk_pad // bk, nq_pad // bq),
        in_specs=[q_spec2, k_spec2, k_spec2, q_spec2, stat_spec2, stat_spec2],
        out_specs=(k_spec2, k_spec2),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, nk_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, nk_pad, D), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32), pltpu.VMEM((bk, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qt, kt, vt, dot, lse_b, delta_b)

    dq = jnp.transpose(dq[:, :, :Nq], (0, 2, 1, 3))
    dk = jnp.transpose(dk[:, :, :Nk], (0, 2, 1, 3))
    dv = jnp.transpose(dv[:, :, :Nk], (0, 2, 1, 3))
    return dq, dk, dv


def _fa_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _flash_attention_impl(q, k, v, scale, block_q, block_k, with_lse=True)
    return out, (q, k, v, out, lse)


_warned_bwd_fallback = False


def _fa_bwd(scale, block_q, block_k, res, g):
    global _warned_bwd_fallback
    q, k, v, out, lse = res
    if jax.devices()[0].platform == "tpu" or _interpret():
        try:
            return _flash_attention_bwd_pallas(q, k, v, out, lse, g, scale, block_q, block_k)
        except Exception as e:
            # A Pallas backward failure on TPU is a kernel/trace bug and a
            # silent perf cliff — surface it once instead of hiding it.
            if not _warned_bwd_fallback:
                _warned_bwd_fallback = True
                warnings.warn(
                    f"Pallas flash-attention backward failed ({type(e).__name__}: {e}); "
                    "falling back to XLA recompute. Set UNICEPTION_TPU_ATTN=xla to silence.",
                    RuntimeWarning,
                    stacklevel=2,
                )
    # fallback: recompute through XLA
    _, vjp = jax.vjp(lambda q_, k_, v_: jax.nn.dot_product_attention(q_, k_, v_, scale=scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
