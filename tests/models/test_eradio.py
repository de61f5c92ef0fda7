"""
E-RADIO hybrid trunk: contract tests (shapes, window-size selection,
differentiability, wrapper integration). The E-RADIO network definition is
external to the reference (torch.hub NVlabs/RADIO), so there is no offline
numeric oracle — these tests pin the encoder contract the reference wrapper
relies on (radio.py:95-98, 127-136).
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.encoders.base import ViTEncoderInput
from uniception_tpu.models.encoders.eradio import ERadio


def test_eradio_window_size_selection():
    m = ERadio("e-radio_v2-test", rngs=nnx.Rngs(0))
    assert m.set_optimal_window_size((512, 512)) == 16  # 16 | 512/32
    assert m.set_optimal_window_size((448, 448)) == 14  # 448/32 = 14
    # 64/32=2, 96/32=3: the only window tiling both is 1
    assert m.set_optimal_window_size((64, 96)) == 1


def test_eradio_forward_shapes_and_grad():
    m = ERadio("e-radio_v2-test", rngs=nnx.Rngs(0))
    m.set_optimal_window_size((64, 64))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32))

    graphdef, state = nnx.split(m)

    @jax.jit
    def fwd(state, x):
        summary, tokens = nnx.merge(graphdef, state)(x)
        return summary, tokens

    summary, tokens = fwd(state, x)
    assert summary.shape == (2, 48)
    assert tokens.shape == (2, (64 // 16) * (64 // 16), 48)
    assert np.isfinite(np.asarray(tokens)).all()

    def loss(state, x):
        s, t = nnx.merge(graphdef, state)(x)
        return (t**2).mean()

    grads = jax.grad(loss)(state, x)
    leaves = jax.tree.leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_eradio_wrapper_integration():
    from uniception_tpu.models.encoders.radio import RADIOEncoder

    enc = RADIOEncoder(
        name="E-RADIO", data_norm_type="radio", model_version="e-radio_v2",
        eradio_input_shape=(64, 64), rngs=nnx.Rngs(0),
    )
    x = jnp.asarray(np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32))
    out = enc(ViTEncoderInput(data_norm_type="radio", image=x))
    assert out.features.shape == (1, 1536, 4, 4)


def test_eradio_requires_input_shape():
    from uniception_tpu.models.encoders.radio import RADIOEncoder

    with pytest.raises(AssertionError):
        RADIOEncoder(name="E-RADIO", data_norm_type="radio", model_version="e-radio_v2", rngs=nnx.Rngs(0))
