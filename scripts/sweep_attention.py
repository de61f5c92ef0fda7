"""
Flash-attention kernel block-size sweep on the real chip.

Times the Pallas forward kernel at ViT-L shapes (B16 N1024 H16 D64 bf16)
across (block_q, block_k) tilings to find the best VMEM schedule. The
TPU-native analogue of the reference's attention micro-benchmark
(scripts/compare_te.py:12-60).
"""

import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from uniception_tpu.ops.flash_attention import _flash_attention_impl
    from uniception_tpu.utils.profile import benchmark_fn_chained

    B, N, H, D = 16, 1024, 16, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
    flops = 4 * B * H * N * N * D

    results = []
    for bq, bk in itertools.product([256, 512, 1024], [256, 512, 1024]):
        try:
            def fn(q, k, v, carry, bq=bq, bk=bk):
                out, _ = _flash_attention_impl(q + (carry * 1e-12).astype(q.dtype), k, v, None, bq, bk, with_lse=False)
                return out.mean().astype(jnp.float32)

            ms = benchmark_fn_chained(fn, q, k, v, iters=30) * 1e3
            tf = flops / (ms * 1e-3) / 1e12
            results.append((bq, bk, ms, tf))
            print(f"bq={bq:5d} bk={bk:5d}  {ms:7.3f} ms  {tf:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq:5d} bk={bk:5d}  FAILED: {type(e).__name__}", flush=True)
    best = max(results, key=lambda r: r[3])
    print(f"BEST: bq={best[0]} bk={best[1]} {best[3]:.1f} TF/s")

    # --- diagnostic: MXU-only lower bound (replaces softmax with a copy) ---
    # Isolates how much of the kernel time is VPU exp/max/rescale work.
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _mxu_only_kernel(q_ref, k_ref, v_ref, o_ref, acc_scr, *, nsteps):
        k_idx = pl.program_id(3)

        @pl.when(k_idx == 0)
        def _init():
            acc_scr[:] = jnp.zeros_like(acc_scr)

        s = jax.lax.dot_general(q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        acc_scr[:] += jax.lax.dot_general(s.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        @pl.when(k_idx == nsteps - 1)
        def _fin():
            o_ref[0, 0] = acc_scr[:].astype(o_ref.dtype)

    bq = bk = 1024
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    def mxu_only(qt, kt, vt, carry):
        out = pl.pallas_call(
            functools.partial(_mxu_only_kernel, nsteps=N // bk),
            grid=(B, H, N // bq, N // bk),
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, N, D), qt.dtype),
            scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        )(qt + (carry * 1e-12).astype(qt.dtype), kt, vt)
        return out.mean().astype(jnp.float32)

    ms = benchmark_fn_chained(mxu_only, qt, kt, vt, iters=30) * 1e3
    print(f"MXU-only (no softmax): {ms:7.3f} ms  {flops / (ms * 1e-3) / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
