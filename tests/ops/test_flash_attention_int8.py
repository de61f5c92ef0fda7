"""Int8 flash-attention kernel (ops/flash_attention.py::_fa_single_kernel_int8)
in Pallas interpret mode: accuracy vs the exact softmax reference.

w8a8 attention physics: per-row q + smoothed per-block k int8 gives ~0.3-1%
relative error on the attention output; the golden-gate-relevant bound is
measured end-to-end on TPU (BASELINE.md). The K-mean smoothing must be
softmax-invariant — verified explicitly.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uniception_tpu.models.utils.config import set_attention_quant
from uniception_tpu.ops.attention import _naive_attention
from uniception_tpu.ops.flash_attention import flash_attention


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # monkeypatch (not os.environ.pop) so a pre-existing value is restored —
    # popping would strip interpret mode from later test files' runs
    monkeypatch.setenv("UNICEPTION_TPU_PALLAS_INTERPRET", "1")
    yield
    set_attention_quant("none")


def _mk(b=1, n=64, h=2, d=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32)).astype(jnp.bfloat16)
    return q, k, v


@pytest.mark.parametrize("mode,tol", [("int8", 2e-2), ("int8pv", 3e-2)])
def test_int8_kernel_close_to_exact(mode, tol):
    q, k, v = _mk()
    ref = _naive_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), q.shape[-1] ** -0.5)
    set_attention_quant(mode)
    out = flash_attention(q, k, v).astype(jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < tol, rel


def test_int8_kernel_with_k_offset_matches_smoothing_invariance():
    "Adding a constant to every key shifts logits per-row-constantly: output invariant."
    q, k, v = _mk(seed=1)
    set_attention_quant("int8")
    base = flash_attention(q, k, v).astype(jnp.float32)
    shifted = flash_attention(q, k + jnp.bfloat16(3.0), v).astype(jnp.float32)
    # K smoothing subtracts the mean, so the int8 grid sees identical values
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(base), atol=2e-2, rtol=2e-2)


def test_int8_ragged_kv_masking():
    "kv_len not divisible by block: padded keys must not leak into stats."
    q, k, v = _mk(n=50, seed=2)
    ref = _naive_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), q.shape[-1] ** -0.5)
    set_attention_quant("int8")
    out = flash_attention(q, k, v).astype(jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_int8_inference_only_training_path_unaffected():
    "Differentiated calls (lse path) must keep using the bf16 kernel exactly."
    q, k, v = _mk(seed=3)

    def loss(q, k, v):
        return flash_attention(q, k, v).astype(jnp.float32).sum()

    set_attention_quant("none")
    ref = jax.grad(loss)(q, k, v)
    set_attention_quant("int8")
    out = jax.grad(loss)(q, k, v)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
