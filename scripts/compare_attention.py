#!/usr/bin/env python
"""
Attention micro-benchmark: Pallas flash attention vs XLA SDPA vs naive.

TPU-native analogue of reference scripts/compare_te.py:12-60 (which timed
TransformerEngine vs UniCeption attention with CUDA events). Timing is
scan-chained on-device (see uniception_tpu/utils/profile.py) so tunnel
latency doesn't pollute the numbers.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--seq", type=int, default=1024)
    parser.add_argument("--heads", type=int, default=16)
    parser.add_argument("--head-dim", type=int, default=64)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    import jax.numpy as jnp

    from uniception_tpu.ops.attention import scaled_dot_product_attention
    from uniception_tpu.utils.profile import benchmark_fn_chained

    B, N, H, D = args.batch, args.seq, args.heads, args.head_dim
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, H, D), dt)
    flops = 4 * B * H * N * N * D

    print(f"attention benchmark: B={B} N={N} H={H} D={D} dtype={dt}")
    for impl in ["pallas", "xla", "naive"]:
        try:
            sec = benchmark_fn_chained(
                lambda q, c, impl=impl: scaled_dot_product_attention(
                    q + c.astype(q.dtype) * 1e-12, q, q, impl=impl
                ).mean(),
                q,
            )
            print(f"  {impl:8s}: {sec*1e3:8.3f} ms  {flops/sec/1e12:6.1f} TF/s")
        except Exception as e:
            print(f"  {impl:8s}: failed ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
