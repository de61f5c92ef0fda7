"""Standalone XLA bf16 rates at the exact ViT-L block shapes.

Answers one question for the serving bf16 tier (BASELINE.md round 4): is the
in-model mlp rate (~118 TF/s, perturbation-corrected) an XLA-matmul property
of these shapes, or glue overhead a fused Pallas mlp kernel could reclaim?
Measures each projection standalone, the fc1->gelu->fc2 chain, and the same
chain with the f32 residual/LayerNorm epilogue the model carries.

Run on TPU (default env): python scripts/bench_bf16_shapes.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from uniception_tpu.utils.profile import benchmark_fn_chained

    B, N, C = 4, 1024, 1024
    M = B * N
    rng = np.random.RandomState(0)

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.02).astype(jnp.bfloat16)

    x = mk(M, C)
    w_qkv = mk(C, 3 * C)
    w_proj = mk(C, C)
    w_fc1 = mk(C, 4 * C)
    w_fc2 = mk(4 * C, C)

    def rate(name, fn, args, flops, iters=None):
        # benchmark_fn_chained contract (utils/profile.py): fn(*args, carry)
        # must consume the scan carry (carry * 1e-12 — `* 0` gets
        # constant-folded and the body hoisted) and reduce to a f32 scalar.
        # The two-length subtraction needs (iters * body) >> tunnel timing
        # jitter (~ms); per-layer bodies here run 0.05-0.4 ms, so default the
        # scan-length delta to cover >= ~30 ms of device work.
        if iters is None:
            iters = max(30, int(200e12 * 30e-3 / max(flops, 1)))  # ~30 ms at 200 TF/s
        t = benchmark_fn_chained(fn, *args, iters=iters)
        print(f"{name:<34} {t * 1e3:7.3f} ms  {flops / t / 1e12:7.1f} TF/s", flush=True)
        return t

    def _reduce(y):
        # a plain y.sum() lets XLA's algebraic simplifier collapse the matmul
        # to a matvec (sum_j (x@w)_ij = x @ (w@1) — measured 800 "TF/s" on a
        # 1024x1024 proj, i.e. above hardware peak); the squared sum cannot
        # be factored through the dot, so the full matmul must execute
        return jnp.sum(y * y, dtype=jnp.float32)

    def matmul_rate(a, w, c):
        return _reduce((a + c.astype(a.dtype) * 1e-12) @ w)

    rate("qkv (4096x1024x3072)", matmul_rate, (x, w_qkv), 2 * M * C * 3 * C)
    rate("proj (4096x1024x1024)", matmul_rate, (x, w_proj), 2 * M * C * C)
    rate("fc1 (4096x1024x4096)", matmul_rate, (x, w_fc1), 2 * M * C * 4 * C)
    rate("fc2 (4096x4096x1024)", matmul_rate, (mk(M, 4 * C), w_fc2), 2 * M * 4 * C * C)

    mlp_flops = 2 * M * C * 4 * C * 2

    def mlp(a, w1, w2, c):
        h = jax.nn.gelu((a + c.astype(a.dtype) * 1e-12) @ w1, approximate=True)
        return _reduce(h @ w2)

    rate("mlp chain fc1+gelu+fc2", mlp, (x, w_fc1, w_fc2), mlp_flops)

    # the in-model context: f32 residual stream + LayerNorm before, add after
    res = jnp.asarray(rng.randn(M, C).astype(np.float32))
    g = jnp.ones((C,), jnp.float32)
    b = jnp.zeros((C,), jnp.float32)

    def mlp_in_context(r, w1, w2, g, b, c):
        r = r + c.astype(r.dtype) * 1e-12
        mu = r.mean(-1, keepdims=True)
        var = ((r - mu) ** 2).mean(-1, keepdims=True)
        h = ((r - mu) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(jnp.bfloat16)
        h = jax.nn.gelu(h @ w1, approximate=True)
        return _reduce(r + (h @ w2).astype(jnp.float32))

    rate("ln+mlp+residual (f32 stream)", mlp_in_context, (res, w_fc1, w_fc2, g, b), mlp_flops)

    # bf16 residual stream variant (serving: whole state bf16)
    res16 = res.astype(jnp.bfloat16)

    def mlp_in_context16(r, w1, w2, g, b, c):
        r = r + c.astype(r.dtype) * 1e-12
        rf = r.astype(jnp.float32)
        mu = rf.mean(-1, keepdims=True)
        var = ((rf - mu) ** 2).mean(-1, keepdims=True)
        h = ((rf - mu) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(jnp.bfloat16)
        h = jax.nn.gelu(h @ w1, approximate=True)
        return _reduce(r + (h @ w2).astype(jnp.bfloat16))

    rate("ln+mlp+residual (bf16 stream)", mlp_in_context16, (res16, w_fc1, w_fc2, g, b), mlp_flops)

    # pure-matmul roofline re-check at a big square shape
    big = mk(8192, 8192)
    rate("roofline 8192^3", matmul_rate, (big, mk(8192, 8192)), 2 * 8192**3)


if __name__ == "__main__":
    main()
