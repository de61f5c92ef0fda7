#!/usr/bin/env python
"""
On-chip verdict for the Pallas fused-quant int8 matmul (ops/int8_matmul.py)
vs the XLA w8a8 path (nn/quant.py Int8Linear) at the ViT-L trunk shapes.

VERDICT r2 item 7: one attempt at harvesting the ~0.10 ms/block quant-glue
slice — measure, keep if it wins, ledger if not (BASELINE.md).

Usage: python scripts/bench_int8_matmul.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    # Pin the Int8Linear call to the XLA lowering: since the shape-gated
    # auto-routing landed (nn/quant.py), qlin(x) at K>=4096 would otherwise
    # route into the very Pallas kernel this script benchmarks it against.
    os.environ["UNICEPTION_TPU_INT8_MATMUL"] = "xla"

    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.nn.common import LinearX
    from uniception_tpu.nn.quant import Int8Linear
    from uniception_tpu.ops.int8_matmul import int8_matmul_dynamic
    from uniception_tpu.utils.profile import benchmark_fn_chained

    # trunk shapes at the bench config (b2 pairs => 4096 tokens encoder,
    # 2048 decoder): (M, K, N) for qkv / proj / fc1 / fc2
    shapes = [
        ("enc qkv", 4096, 1024, 3072),
        ("enc proj", 4096, 1024, 1024),
        ("enc fc1", 4096, 1024, 4096),
        ("enc fc2", 4096, 4096, 1024),
        ("dec qkv", 2048, 768, 2304),
    ]
    rng = np.random.RandomState(0)
    for name, M, K, N in shapes:
        lin = LinearX(K, N, rngs=nnx.Rngs(0))
        qlin = Int8Linear.from_linear(lin)
        x = jnp.asarray(rng.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
        w_q, w_scale = qlin.w_q[...], qlin.w_scale[...]
        bias = qlin.bias[...]

        def xla_path(x, c):
            return qlin(x + (c * 1e-12).astype(x.dtype)).astype(jnp.float32).mean()

        def pallas_path(x, c):
            return int8_matmul_dynamic(
                x + (c * 1e-12).astype(x.dtype), w_q, w_scale, bias
            ).astype(jnp.float32).mean()

        t_x = benchmark_fn_chained(xla_path, x, iters=30)
        t_p = benchmark_fn_chained(pallas_path, x, iters=30)
        tops = 2 * M * K * N
        print(
            f"{name:9s} M{M} K{K} N{N}: xla {t_x * 1e6:7.1f} us ({tops / t_x / 1e12:5.1f} TOP/s) | "
            f"pallas {t_p * 1e6:7.1f} us ({tops / t_p / 1e12:5.1f} TOP/s) | "
            f"{'PALLAS' if t_p < t_x else 'xla'} wins by {abs(t_x - t_p) / max(t_x, t_p) * 100:.0f}%"
        )


if __name__ == "__main__":
    main()
