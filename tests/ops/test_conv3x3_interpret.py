"""
Pallas 3x3 conv (ops/conv3x3.py) vs the XLA conv contraction, interpret
mode. The dispatch bounds (bf16-only, <=256² spatial) live in
nn/dpt_parts._Conv2dDPT and are perf policy, not correctness — the kernel
itself must be exact for any eligible shape.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from uniception_tpu.ops.conv3x3 import conv3x3_nhwc, conv3x3_reference


@pytest.mark.parametrize("B,H,W,C,Co", [(2, 16, 32, 8, 16), (1, 13, 31, 8, 16), (1, 8, 8, 16, 8)])
@pytest.mark.parametrize("with_bias", [True, False])
def test_conv3x3_matches_xla(B, H, W, C, Co, with_bias):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, C, Co) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.randn(Co).astype(np.float32)) if with_bias else None
    ref = conv3x3_reference(x, w, b)
    out = conv3x3_nhwc(x, w, b, block_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_conv3x3_gradients_match_xla():
    "The Pallas forward must be differentiable (custom_vjp through the XLA conv)."
    import jax

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 8, 8) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))

    def loss_pallas(x, w, b):
        return jnp.sum(conv3x3_nhwc(x, w, b, block_h=8, interpret=True) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(conv3x3_reference(x, w, b) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4, rtol=1e-4)


def test_conv3x3_block_not_dividing_height():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 21, 16, 8).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 8, 8) * 0.1).astype(np.float32))
    ref = conv3x3_reference(x, w, None)
    out = conv3x3_nhwc(x, w, None, block_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
