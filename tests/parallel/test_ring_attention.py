"""
Ring attention: exact-match against single-device attention with the token
axis sharded across the 8-way mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniception_tpu.ops.attention import scaled_dot_product_attention
from uniception_tpu.parallel.mesh import make_mesh
from uniception_tpu.parallel.ring_attention import ring_attention_sharded

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.mark.parametrize("n_tokens", [256, pytest.param(512, marks=pytest.mark.slow)])
def test_ring_attention_matches_full(n_tokens):
    rng = np.random.RandomState(0)
    B, H, D = 2, 4, 32
    q = jnp.asarray(rng.randn(B, n_tokens, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, n_tokens, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, n_tokens, H, D).astype(np.float32))

    ref = scaled_dot_product_attention(q, k, v, impl="naive")

    mesh = make_mesh(data=8, model=1)
    with mesh:
        out = ring_attention_sharded(q, k, v, mesh, axis_name="data")

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n_tokens", [256])
def test_ring_attention_grads_match_full(n_tokens):
    """Training-side SP proof: d(loss)/d(q,k,v) through the ring (ppermute +
    scan + online-softmax recurrence) must match dense-attention grads."""
    rng = np.random.RandomState(1)
    B, H, D = 2, 4, 32
    q = jnp.asarray(rng.randn(B, n_tokens, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, n_tokens, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, n_tokens, H, D).astype(np.float32))
    cot = jnp.asarray(rng.randn(B, n_tokens, H, D).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.vdot(scaled_dot_product_attention(q, k, v, impl="naive"), cot)

    mesh = make_mesh(data=8, model=1)

    def loss_ring(q, k, v):
        with mesh:
            return jnp.vdot(ring_attention_sharded(q, k, v, mesh, axis_name="data"), cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=f"d{name}")
