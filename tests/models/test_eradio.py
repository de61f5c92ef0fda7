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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_window_partition_matches_explicit_blocked_attention():
    """The window reshape must equal explicitly slicing each (win x win)
    block: attention computed through _window_partition == attention
    computed per-block with plain array slicing (VERDICT r1 item 8)."""
    import numpy as np
    from uniception_tpu.models.encoders.eradio import _window_merge, _window_partition

    rng = np.random.RandomState(0)
    B, H, W, C, win = 2, 8, 12, 6, 4
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))

    t = _window_partition(x, win)
    assert t.shape == (B * (H // win) * (W // win), win * win, C)

    # explicit blocked view: window order must be row-major over (bH, bW)
    idx = 0
    for b in range(B):
        for bh in range(H // win):
            for bw in range(W // win):
                block = x[b, bh * win : (bh + 1) * win, bw * win : (bw + 1) * win, :]
                np.testing.assert_array_equal(np.asarray(t[idx]), np.asarray(block.reshape(win * win, C)))
                idx += 1

    # merge is the exact inverse
    np.testing.assert_array_equal(np.asarray(_window_merge(t, win, H, W)), np.asarray(x))


def test_windowed_attention_equals_explicit_blocked_attention():
    "A _WindowAttnBlock output == running its attention on each block separately."
    import numpy as np
    from flax import nnx
    from uniception_tpu.models.encoders.eradio import _WindowAttnBlock
    from uniception_tpu.ops.attention import scaled_dot_product_attention

    rng = np.random.RandomState(1)
    B, H, W, C, win, heads = 1, 8, 8, 8, 4, 2
    blk = _WindowAttnBlock(C, heads, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    out = blk(x, win)

    # explicit: per-window attention with plain slicing, no partition helper
    def attn_one(tok):  # (L, C)
        qkv = blk.qkv(tok).reshape(1, tok.shape[0], 3, heads, C // heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = scaled_dot_product_attention(q, k, v)
        return blk.proj(a.reshape(1, tok.shape[0], C))[0]

    y = np.array(x)
    normed = blk.norm1(x)
    for bh in range(H // win):
        for bw in range(W // win):
            tok = normed[0, bh * win : (bh + 1) * win, bw * win : (bw + 1) * win, :].reshape(win * win, C)
            y[0, bh * win : (bh + 1) * win, bw * win : (bw + 1) * win, :] += np.asarray(
                attn_one(tok).reshape(win, win, C)
            )
    y = jnp.asarray(y)
    expected = y + blk.fc2(jax.nn.gelu(blk.fc1(blk.norm2(y))))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5, rtol=1e-5)
