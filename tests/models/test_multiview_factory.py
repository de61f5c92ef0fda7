"""
Multi-view factory model + alternating-attention frame reshape unit test
(reference analogue: alternating_attention_transformer.py:998
test_reshape_for_frame_attention).
"""

import numpy as np
from flax import nnx

import jax.numpy as jnp

from uniception_tpu.models.factory.multiview import MultiViewPointmapModel
from uniception_tpu.models.info_sharing.alternating_attention_transformer import (
    reshape_for_frame_attention,
    reshape_from_frame_attention,
)


def test_frame_reshape_roundtrip():
    B, V, T, C = 2, 3, 5, 4
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randn(B, V * T, C).astype(np.float32))
    frame = reshape_for_frame_attention(tokens, V, T, C)
    assert frame.shape == (B * V, T, C)
    # view v of batch b maps to row b*V + v
    np.testing.assert_array_equal(np.asarray(frame[1 * V + 2]), np.asarray(tokens[1, 2 * T : 3 * T]))
    back = reshape_from_frame_attention(frame, B, V, T, C)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(tokens))


def test_multiview_model_forward():
    model = MultiViewPointmapModel(
        name="mv_test", num_views=3, img_size=(32, 32), attention_type="alternating",
        enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
        info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
        rngs=nnx.Rngs(0),
    )
    rng = np.random.RandomState(0)
    views = [jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32)) for _ in range(3)]
    results = model(views)
    assert len(results) == 3
    for r in results:
        assert r["pts3d"].shape == (2, 32, 32, 3)
        assert r["conf"].shape == (2, 32, 32, 1)
        assert float(r["conf"].min()) >= 1.0
