"""
Attention/CrossAttention modules in UNICEPTION_TPU_ATTN=fused mode
(interpret) vs the naive softmax oracle: the fused dispatch must be a pure
implementation detail — identical outputs, same modules, same weights.
"""

import os

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

os.environ.setdefault("UNICEPTION_TPU_PALLAS_INTERPRET", "1")

from uniception_tpu.models.utils.config import set_attention_impl  # noqa: E402
from uniception_tpu.nn.blocks import Attention, CrossAttention  # noqa: E402
from uniception_tpu.ops.rope import Rope2D  # noqa: E402


@pytest.fixture
def fused_mode():
    set_attention_impl("fused")
    yield
    set_attention_impl("pallas")


def _positions(B, H, W):
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pos = np.stack([y.ravel(), x.ravel()], -1)
    return jnp.asarray(np.broadcast_to(pos, (B, H * W, 2)).copy())


@pytest.mark.parametrize("use_rope,qkv_bias,ssmax", [(True, True, False), (False, False, True)])
def test_attention_module_fused_matches_naive(fused_mode, use_rope, qkv_bias, ssmax):
    rope = Rope2D(freq=100.0) if use_rope else None
    mod = Attention(
        dim=64, num_heads=4, qkv_bias=qkv_bias, custom_positional_encoding=rope,
        use_scalable_softmax=ssmax, rngs=nnx.Rngs(0),
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 48, 64).astype(np.float32))
    pos = _positions(2, 6, 8) if use_rope else None

    out_fused = mod(x, pos)
    set_attention_impl("naive")
    out_ref = mod(x, pos)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref), atol=2e-5, rtol=2e-5)


def test_cross_attention_module_fused_matches_naive(fused_mode):
    rope = Rope2D(freq=100.0)
    mod = CrossAttention(dim=64, num_heads=4, qkv_bias=True, custom_positional_encoding=rope, rngs=nnx.Rngs(0))
    rng = np.random.RandomState(1)
    xq = jnp.asarray(rng.randn(2, 24, 64).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 48, 64).astype(np.float32))
    qpos = _positions(2, 4, 6)
    kpos = _positions(2, 6, 8)

    out_fused = mod(xq, y, y, qpos, kpos)
    set_attention_impl("naive")
    out_ref = mod(xq, y, y, qpos, kpos)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref), atol=2e-5, rtol=2e-5)


def test_cross_attention_distinct_kv_falls_back(fused_mode):
    "key is not value -> the fused kernel must not be used (and must still work)."
    mod = CrossAttention(dim=32, num_heads=2, rngs=nnx.Rngs(0))
    rng = np.random.RandomState(2)
    xq = jnp.asarray(rng.randn(1, 16, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 16, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 16, 32).astype(np.float32))
    out = mod(xq, k, v)
    set_attention_impl("naive")
    ref = mod(xq, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fast_init_zeros_then_checkpoint_load_matches():
    """fast_init (serving cold-start) must be purely an init-speed knob:
    zeros-init + weight load == normal init + the same weight load."""
    import numpy as np
    from flax import nnx
    import jax.numpy as jnp

    from uniception_tpu.models.utils.config import fast_init, get_fast_init
    from uniception_tpu.nn.blocks import SelfAttentionBlock

    assert not get_fast_init()
    ref = SelfAttentionBlock(dim=64, num_heads=4, rngs=nnx.Rngs(0))
    with fast_init():
        fast = SelfAttentionBlock(dim=64, num_heads=4, rngs=nnx.Rngs(0))
    assert not get_fast_init()  # context restored
    # fast-init params are zeros (no PRNG work)
    assert float(jnp.abs(fast.attn.qkv.kernel[...]).max()) == 0.0
    assert float(jnp.abs(ref.attn.qkv.kernel[...]).max()) > 0.0

    # copying weights over erases the difference entirely
    nnx.update(fast, nnx.state(ref, nnx.Param))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 64).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(fast(x)), np.asarray(ref(x)))
