"""
Ring attention integrated into a real model path (VERDICT r1 item 5):
the many-view global-attention model with the V*T token axis sharded over
an 8-way mesh must match the unsharded model <= 2e-5.
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.factory.multiview import MultiViewPointmapModel
from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput
from uniception_tpu.models.info_sharing.global_attention_transformer import MultiViewGlobalAttentionTransformer
from uniception_tpu.ops.attention import sequence_parallel
from uniception_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_global_attention_transformer_ring_matches_unsharded():
    "Transformer-level: 4 views x 16 tokens sharded 8-way over the ring."
    mesh = make_mesh(data=8, model=1)
    model = MultiViewGlobalAttentionTransformer(
        name="sp_test", input_embed_dim=48, dim=64, depth=2, num_heads=4, rngs=nnx.Rngs(0)
    )
    rng = np.random.RandomState(0)
    views = [jnp.asarray(rng.randn(2, 48, 4, 4).astype(np.float32)) for _ in range(4)]
    inp = MultiViewTransformerInput(features=list(views))

    ref = model(inp)
    with sequence_parallel(mesh, "data"):
        out = model(inp)

    for a, b in zip(out.features, ref.features):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)


def test_multiview_model_sequence_parallel_matches_unsharded():
    "Model-level: the factory's sequence_parallel config routes the info-sharing through the ring."
    mesh = make_mesh(data=8, model=1)
    common = dict(
        name="sp_model", num_views=4, img_size=(32, 32), attention_type="global",
        enc_embed_dim=48, enc_depth=1, enc_num_heads=4,
        info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
    )
    model_ref = MultiViewPointmapModel(rngs=nnx.Rngs(0), **common)
    model_sp = MultiViewPointmapModel(rngs=nnx.Rngs(0), sequence_parallel=(mesh, "data"), **common)

    rng = np.random.RandomState(1)
    views = [jnp.asarray(rng.randn(1, 3, 32, 32).astype(np.float32)) for _ in range(4)]
    ref = model_ref(views)
    out = model_sp(views)

    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a["pts3d"]), np.asarray(b["pts3d"]), atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(a["conf"]), np.asarray(b["conf"]), atol=2e-5, rtol=2e-5)


def test_sequence_parallel_under_jit():
    "The SP-routed model must trace/compile under jit with sharded inputs."
    mesh = make_mesh(data=8, model=1)
    model = MultiViewGlobalAttentionTransformer(
        name="sp_jit", input_embed_dim=48, dim=64, depth=1, num_heads=4, rngs=nnx.Rngs(0)
    )
    graphdef, state = nnx.split(model)
    rng = np.random.RandomState(2)
    views = [jnp.asarray(rng.randn(2, 48, 4, 4).astype(np.float32)) for _ in range(4)]

    @jax.jit
    def run(state, views):
        m = nnx.merge(graphdef, state)
        with sequence_parallel(mesh, "data"):
            return m(MultiViewTransformerInput(features=list(views))).features[0]

    out = run(state, views)
    ref = model(MultiViewTransformerInput(features=list(views))).features[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_sequence_parallel_transformer_grads_match_unsharded():
    """SP for training: parameter gradients of the global-attention
    transformer under the ring must match the dense path <= 1e-4.

    The loss is a generic vdot against a fixed random cotangent — NOT
    sum-of-squares: the final LayerNorm puts outputs on a sphere where
    sum(f^2) is nearly constant, so its upstream gradient is a catastrophic
    f32 cancellation that drowns both paths in identical-magnitude noise
    (measured: dense-f32 and ring-f32 each deviate 0.12 from a float64
    oracle on that loss, while ring-f64 matches dense-f64 to 4e-8)."""
    mesh = make_mesh(data=8, model=1)
    model = MultiViewGlobalAttentionTransformer(
        name="sp_grad", input_embed_dim=48, dim=64, depth=2, num_heads=4, rngs=nnx.Rngs(0)
    )
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    rng = np.random.RandomState(3)
    views = [jnp.asarray(rng.randn(2, 48, 4, 4).astype(np.float32)) for _ in range(4)]
    cots = [jnp.asarray(rng.randn(2, 64, 4, 4).astype(np.float32)) for _ in range(4)]

    def loss(params, use_sp):
        m = nnx.merge(graphdef, params, rest)
        inp = MultiViewTransformerInput(features=list(views))
        if use_sp:
            with sequence_parallel(mesh, "data"):
                out = m(inp)
        else:
            out = m(inp)
        return sum(jnp.vdot(f, c) for f, c in zip(out.features, cots))

    g_ref = jax.grad(lambda s: loss(s, False))(params)
    g_sp = jax.grad(lambda s: loss(s, True))(params)

    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_sp = jax.tree.leaves(g_sp)
    assert len(flat_ref) == len(flat_sp) > 0
    for (path, a), b in zip(flat_ref, flat_sp):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-4,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}",
        )
