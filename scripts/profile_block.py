#!/usr/bin/env python
"""
Per-component timing of one ViT-L SelfAttentionBlock on TPU.

Times the full block and each sub-op (norms, qkv proj, rope, attention
kernel, out proj, mlp) with scan-chained on-device timing, then prints the
overhead = full - sum(parts attributable to the floor). Drives kernel-fusion
decisions (BASELINE.md perf notes).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--int8", action="store_true", help="profile the w8a8-quantized block (nn/quant.py)")
    args = ap.parse_args()

    from uniception_tpu.models.utils.config import set_gelu_mode
    from uniception_tpu.nn.blocks import SelfAttentionBlock
    from uniception_tpu.ops.flash_attention import flash_attention
    from uniception_tpu.ops.rope import Rope2D, rope_2d
    from uniception_tpu.utils.profile import benchmark_fn_chained

    set_gelu_mode(os.environ.get("BENCH_GELU", "tanh"))
    B, N, C, H = args.batch, args.tokens, args.dim, args.heads
    D = C // H
    rope = Rope2D(freq=100.0)
    blk = SelfAttentionBlock(
        dim=C, num_heads=H, qkv_bias=True, custom_positional_encoding=rope,
        dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(blk)
    state = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state)
    blk = nnx.merge(graphdef, state)
    if args.int8:
        from uniception_tpu.nn.quant import quantize_linears

        n_q = quantize_linears(blk, min_params=1)
        print(f"int8-quantized {n_q} linears in the block")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(jnp.bfloat16)
    side = int(np.sqrt(N))
    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    pos = jnp.asarray(np.broadcast_to(np.stack([yy.ravel(), xx.ravel()], -1), (B, N, 2)).copy())

    if args.int8:
        qkv_fn = lambda t: blk.attn.qkv(t)  # noqa: E731
        proj_fn = lambda t: blk.attn.proj(t)  # noqa: E731
        fc2_fn = lambda t: blk.mlp.fc2(t)  # noqa: E731
    else:
        qkv_w = blk.attn.qkv.kernel[...]
        qkv_b = blk.attn.qkv.bias[...]
        proj_w = blk.attn.proj.kernel[...]
        qkv_fn = lambda t: t @ qkv_w + qkv_b  # noqa: E731
        proj_fn = lambda t: t @ proj_w  # noqa: E731
        fc2_fn = lambda t: t @ blk.mlp.fc2.kernel[...]  # noqa: E731
    q4 = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32)).astype(jnp.bfloat16)
    p_full = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(jnp.bfloat16)
    h_mlp = jnp.asarray(rng.randn(B, N, 4 * C).astype(np.float32)).astype(jnp.bfloat16)

    def c_(c, t):
        return (c * 1e-12).astype(t.dtype)

    cases = {
        "full_block": lambda x, c: blk(x + c_(c, x), pos).mean().astype(jnp.float32),
        "norm1": lambda x, c: blk.norm1(x + c_(c, x)).mean().astype(jnp.float32),
        "qkv_proj": lambda x, c: qkv_fn(x + c_(c, x)).mean().astype(jnp.float32),
        "rope_q": lambda x, c: rope_2d(q4 + c_(c, q4), pos).mean().astype(jnp.float32),
        "attn_kernel": lambda x, c: flash_attention(q4 + c_(c, q4), q4, q4, scale=D**-0.5).mean().astype(jnp.float32),
        "out_proj": lambda x, c: proj_fn(p_full + c_(c, p_full)).mean().astype(jnp.float32),
        "mlp": lambda x, c: blk.mlp(x + c_(c, x)).mean().astype(jnp.float32),
        "mlp_fc2_only": lambda x, c: fc2_fn(h_mlp + c_(c, h_mlp)).mean().astype(jnp.float32),
    }
    times = {}
    for name, fn in cases.items():
        sec = benchmark_fn_chained(fn, x, iters=args.iters)
        times[name] = sec * 1e3
        print(f"{name:14s} {sec * 1e3:7.3f} ms")

    parts = times["norm1"] * 2 + times["qkv_proj"] + times["rope_q"] * 2 + times["attn_kernel"] + times["out_proj"] + times["mlp"]
    print(f"sum-of-parts   {parts:7.3f} ms   full {times['full_block']:7.3f} ms   "
          f"fusion-gain-in-full {parts - times['full_block']:+.3f} ms")


if __name__ == "__main__":
    main()
