"""
Fused qkv+RoPE+attention kernel vs the unfused composition (interpret mode).

The fused kernel must match `_self_reference` / `_cross_reference` (XLA
matmul + jnp RoPE + SDPA) bit-for-tolerance; gradients flow through the
unfused recompute so only value parity is kernel-specific.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

os.environ.setdefault("UNICEPTION_TPU_PALLAS_INTERPRET", "1")


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # per-test (not import-time): another test file's teardown may have
    # removed the env var between collection and this test's run
    monkeypatch.setenv("UNICEPTION_TPU_PALLAS_INTERPRET", "1")


from uniception_tpu.ops.fused_attention import (  # noqa: E402
    _cross_reference,
    _self_reference,
    fused_cross_rope_attention,
    fused_qkv_rope_attention,
)


def _positions(B, H, W):
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pos = np.stack([y.ravel(), x.ravel()], -1)
    return jnp.asarray(np.broadcast_to(pos, (B, H * W, 2)).copy())


@pytest.mark.parametrize("N,C,heads", [(64, 96, 4), (49, 64, 2)])
@pytest.mark.parametrize("use_rope", [True, False])
def test_fused_self_matches_reference(N, C, heads, use_rope):
    rng = np.random.RandomState(0)
    B = 2
    head_dim = C // heads
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    w = jnp.asarray((rng.randn(C, 3 * C) * 0.05).astype(np.float32))
    b = jnp.asarray((rng.randn(3 * C) * 0.1).astype(np.float32))
    if use_rope:
        side = int(np.ceil(np.sqrt(N)))
        pos = _positions(B, side, side)[:, :N]
    else:
        pos = None
    scale = head_dim**-0.5

    ref = _self_reference(x, w, b, pos, heads, scale, 100.0, 1.0)
    out = fused_qkv_rope_attention(x, w, b, pos, heads, scale, 100.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_self_grads_match_reference():
    rng = np.random.RandomState(1)
    B, N, C, heads = 1, 32, 64, 4
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    w = jnp.asarray((rng.randn(C, 3 * C) * 0.05).astype(np.float32))
    b = jnp.asarray((rng.randn(3 * C) * 0.1).astype(np.float32))
    pos = _positions(B, 4, 8)
    scale = (C // heads) ** -0.5

    def loss_fused(x, w, b):
        return jnp.sum(fused_qkv_rope_attention(x, w, b, pos, heads, scale, 100.0, 1.0) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(_self_reference(x, w, b, pos, heads, scale, 100.0, 1.0) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("Nq,Nk", [(48, 80), (64, 64)])
@pytest.mark.parametrize("use_rope", [True, False])
def test_fused_cross_matches_reference(Nq, Nk, use_rope):
    rng = np.random.RandomState(2)
    B, C, heads = 2, 64, 4
    xq = jnp.asarray(rng.randn(B, Nq, C).astype(np.float32))
    xkv = jnp.asarray(rng.randn(B, Nk, C).astype(np.float32))
    wq = jnp.asarray((rng.randn(C, C) * 0.05).astype(np.float32))
    wkv = jnp.asarray((rng.randn(C, 2 * C) * 0.05).astype(np.float32))
    bq = jnp.asarray((rng.randn(C) * 0.1).astype(np.float32))
    bkv = jnp.asarray((rng.randn(2 * C) * 0.1).astype(np.float32))
    if use_rope:
        qpos = _positions(B, 8, 8)[:, :Nq]
        kpos = _positions(B, 10, 8)[:, :Nk]
    else:
        qpos = kpos = None
    scale = (C // heads) ** -0.5

    ref = _cross_reference(xq, xkv, wq, wkv, bq, bkv, qpos, kpos, heads, scale, 100.0, 1.0)
    out = fused_cross_rope_attention(xq, xkv, wq, wkv, bq, bkv, qpos, kpos, heads, scale, 100.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_multi_qblock_path():
    "Nq large enough to force several q-blocks exercises the kv scratch reuse."
    rng = np.random.RandomState(3)
    B, N, C, heads = 1, 96, 32, 2
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    w = jnp.asarray((rng.randn(C, 3 * C) * 0.05).astype(np.float32))
    b = jnp.zeros((3 * C,), jnp.float32)
    pos = _positions(B, 12, 8)
    scale = (C // heads) ** -0.5

    from uniception_tpu.ops import fused_attention as fa

    orig = fa._plan_fused

    def small_blocks(Nq, Nk, head_dim, dtype):
        bq, nq_pad, nk_pad, cd, prec = orig(Nq, Nk, head_dim, dtype)
        return 32, 96, nk_pad, cd, prec

    fa._plan_fused = small_blocks
    try:
        out = fused_qkv_rope_attention(x, w, b, pos, heads, scale, 100.0, 1.0)
    finally:
        fa._plan_fused = orig
    ref = _self_reference(x, w, b, pos, heads, scale, 100.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
