"""
Pallas flash-attention kernels (forward + backward) against a float64
oracle. TPU-only (the CPU test run falls back to XLA paths); executed
manually / by the driver on the real chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(jax.devices()[0].platform != "tpu", reason="pallas kernels need TPU")


def _f64_grads(q, k, v, D):
    q, k, v = (x.astype(np.float64) for x in (q, k, v))
    sc = D**-0.5
    s = np.einsum("bnhd,bmhd->bhnm", q, k) * sc
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o = np.einsum("bhnm,bmhd->bnhd", p, v)
    do = 2 * o
    dv = np.einsum("bhnm,bnhd->bmhd", p, do)
    dp = np.einsum("bnhd,bmhd->bhnm", do, v)
    delta = np.transpose((do * o).sum(-1), (0, 2, 1))[..., None]
    ds = p * (dp - delta) * sc
    dq = np.einsum("bhnm,bmhd->bnhd", ds, k)
    dk = np.einsum("bhnm,bnhd->bmhd", ds, q)
    return o, dq, dk, dv


@pytest.mark.parametrize("n", [64, 196, 1024, 2048])  # 2048 exercises the multi-k-step kernel
def test_flash_attention_fwd_bwd_vs_f64(n):
    from uniception_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    B, H, D = 1, 2, 64
    q = rng.randn(B, n, H, D).astype(np.float32)
    k = rng.randn(B, n, H, D).astype(np.float32)
    v = rng.randn(B, n, H, D).astype(np.float32)
    o64, dq64, dk64, dv64 = _f64_grads(q, k, v, D)

    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    assert np.abs(np.asarray(out) - o64).max() < 1e-4

    grads = jax.grad(lambda a, b, c: (flash_attention(a, b, c) ** 2).sum(), argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for g, ref in zip(grads, (dq64, dk64, dv64)):
        assert np.abs(np.asarray(g) - ref).max() < 5e-3  # scales with n
