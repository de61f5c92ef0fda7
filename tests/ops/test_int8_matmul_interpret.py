"""Pallas fused-quant int8 matmul (ops/int8_matmul.py) vs the Int8Linear
XLA reference — same symmetric per-token dynamic w8a8 scheme, so outputs
must match to float tolerance (identical quantization decisions)."""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("UNICEPTION_TPU_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("m,k,n,bias", [(64, 128, 256, True), (56, 128, 200, False)])
def test_int8_matmul_matches_int8_linear(m, k, n, bias):
    from uniception_tpu.nn.common import LinearX
    from uniception_tpu.nn.quant import Int8Linear
    from uniception_tpu.ops.int8_matmul import int8_matmul_dynamic

    lin = LinearX(k, n, use_bias=bias, rngs=nnx.Rngs(0))
    qlin = Int8Linear.from_linear(lin)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, m // 2, k).astype(np.float32))

    ref = qlin(x)
    out = int8_matmul_dynamic(
        x, qlin.w_q[...], qlin.w_scale[...],
        qlin.bias[...] if qlin.bias is not None else None,
        block_m=32, block_n=128,
    )
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_int8_linear_routes_wide_k_through_pallas(monkeypatch):
    """Int8Linear auto-routes K>=4096 through the Pallas fused kernel
    (interpret mode here); numerics must match the XLA path exactly
    (identical quantization decisions)."""
    from uniception_tpu.nn.common import LinearX
    from uniception_tpu.nn.quant import Int8Linear, _use_pallas_int8

    lin = LinearX(4096, 64, rngs=nnx.Rngs(0))
    qlin = Int8Linear.from_linear(lin)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 4096).astype(np.float32))

    assert _use_pallas_int8(4096)  # interpret env counts as capable
    out_pallas = qlin(x)

    monkeypatch.setenv("UNICEPTION_TPU_INT8_MATMUL", "xla")
    assert not _use_pallas_int8(4096)
    out_xla = qlin(x)

    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla), rtol=1e-5, atol=1e-5)
