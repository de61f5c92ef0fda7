#!/usr/bin/env python
"""
Microbenchmark: fused qkv+rope+attention kernel vs the unfused pipeline.

Run on TPU. Reports per-call ms for:
  * unfused: LinearX qkv -> rope_2d -> pallas flash_attention
  * fused:   fused_qkv_rope_attention
  * fused-norope / unfused-norope: isolate the in-kernel rope shuffle cost
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from uniception_tpu.ops.flash_attention import flash_attention
    from uniception_tpu.ops.fused_attention import fused_qkv_rope_attention
    from uniception_tpu.ops.rope import rope_2d
    from uniception_tpu.utils.profile import benchmark_fn_chained

    B, N, C, H = args.batch, args.tokens, args.dim, args.heads
    D = C // H
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.randn(C, 3 * C) * 0.02).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.zeros((3 * C,), jnp.bfloat16)
    side = int(np.sqrt(N))
    y, xg = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    pos = jnp.asarray(np.broadcast_to(np.stack([y.ravel(), xg.ravel()], -1), (B, N, 2)).copy())
    scale = D**-0.5

    def unfused(x, use_rope):
        qkv = (x @ w + b).reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if use_rope:
            q = rope_2d(q, pos)
            k = rope_2d(k, pos)
        return flash_attention(q, k, v, scale=scale).reshape(B, N, C)

    cases = {
        "unfused+rope": lambda x, c: unfused(x + (c * 1e-12).astype(x.dtype), True).mean().astype(jnp.float32),
        "unfused-norope": lambda x, c: unfused(x + (c * 1e-12).astype(x.dtype), False).mean().astype(jnp.float32),
        "fused+rope": lambda x, c: fused_qkv_rope_attention(x + (c * 1e-12).astype(x.dtype), w, b, pos, H, scale).mean().astype(jnp.float32),
        "fused-norope": lambda x, c: fused_qkv_rope_attention(x + (c * 1e-12).astype(x.dtype), w, b, None, H, scale).mean().astype(jnp.float32),
    }
    for name, fn in cases.items():
        sec = benchmark_fn_chained(fn, x, iters=args.iters)
        # flops: proj 2*N*C*3C + attn 4*N*N*C (+ ignore rope)
        fl = B * (2 * N * C * 3 * C + 4 * N * N * C)
        print(f"{name:16s} {sec * 1e3:7.3f} ms  {fl / sec / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
