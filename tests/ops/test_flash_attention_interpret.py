"""
Pallas flash-attention kernel logic on CPU via interpret mode — covers the
single-k-step and multi-k-step forward kernels and the Pallas backward
kernels without TPU hardware (the real-chip run is
tests/ops/test_flash_attention_tpu.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("UNICEPTION_TPU_PALLAS_INTERPRET", "1")


def _naive(q, k, v):
    d = q.shape[-1]
    s = np.einsum("bnhd,bmhd->bhnm", q, k) * d**-0.5
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhnm,bmhd->bnhd", p, v)


@pytest.mark.parametrize("n,block_k", [(32, 1024), (48, 16), (40, 16)])  # single-step, multi-step, masked multi-step
def test_interpret_forward(n, block_k):
    from uniception_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    q, k, v = (rng.randn(2, n, 2, 64).astype(np.float32) for _ in range(3))
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, 16, block_k)
    assert np.abs(np.asarray(out) - _naive(q, k, v)).max() < 1e-5


def test_interpret_backward():
    from uniception_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(1, 32, 2, 64).astype(np.float32)) for _ in range(3))

    def loss_pallas(q, k, v):
        return (flash_attention(q, k, v, None, 16, 16) ** 2).sum()

    def loss_ref(q, k, v):
        return (jax.nn.dot_product_attention(q, k, v) ** 2).sum()

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_plan_shrink_keeps_sublane_alignment():
    """The VMEM shrink loop must emit 8-aligned block sizes even when the
    starting bq/bk is not a power of two (e.g. Nq=1032 at D=512: 1032/2=516
    is not a multiple of the 8-sublane tile and Mosaic can refuse it)."""
    from uniception_tpu.ops.flash_attention import _plan

    for nq, nk, d in [(1032, 1032, 512), (1000, 1000, 256), (4104, 4104, 128), (1024, 1024, 512)]:
        q = jax.ShapeDtypeStruct((1, nq, 1, d), jnp.bfloat16)
        k = jax.ShapeDtypeStruct((1, nk, 1, d), jnp.bfloat16)
        B, Nq, Nk, H, D, scale, bq, bk, nq_pad, nk_pad = _plan(q, k, None, 1024, 1024)
        assert bq % 8 == 0 and bk % 8 == 0, (nq, d, bq, bk)
        assert nq_pad % bq == 0 and nk_pad % bk == 0
        # the shrink loop's goal: the working set actually fits
        itemsize = 2
        ws = 2 * (bq + 2 * bk) * D * itemsize + bq * bk * 4 + bq * D * 4
        assert ws <= 8 * 1024 * 1024 or (bq <= 128 and bk <= 128), (nq, d, bq, bk, ws)


# 36 pads to a 40-wide block (round_up(36, 8)), so the padded q-row and
# k-column mask branches actually run; 40 is 8-aligned and would leave the
# NEG_INF masking dead in both cases.
@pytest.mark.parametrize("n", [32, 36])
def test_interpret_backward_fused_single_block(n):
    """Single-block shapes route through the fused dq+dk+dv kernel (5
    matmuls instead of 7); grads must match the XLA reference exactly as
    the two-kernel path does."""
    from uniception_tpu.ops import flash_attention as fa

    rng = np.random.RandomState(2)
    q, k, v = (jnp.asarray(rng.randn(1, n, 2, 64).astype(np.float32)) for _ in range(3))
    cot = jnp.asarray(rng.randn(1, n, 2, 64).astype(np.float32))

    # the default plan must actually take the fused path at this shape
    _, _, _, _, _, _, bq, bk, nq_pad, nk_pad = fa._plan(q, k, None, 1024, 1024)
    assert nq_pad == bq and nk_pad == bk

    def loss_pallas(q, k, v):
        return jnp.vdot(fa.flash_attention(q, k, v), cot)

    def loss_ref(q, k, v):
        return jnp.vdot(jax.nn.dot_product_attention(q, k, v), cot)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_p, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=f"d{name}")
