"""
Sharded inference on the 8-way CPU mesh: dp and dp+tp outputs must match
the unsharded single-device forward.
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.parallel.inference import make_infer_fn

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

SMALL = dict(
    img_size=(32, 32), enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
    info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
)


@pytest.mark.parametrize("model_axis,use_tp", [(1, False), (2, True)])
def test_sharded_inference_matches_unsharded(model_axis, use_tp):
    model = DUSt3R(name="infer_test", rngs=nnx.Rngs(0), **SMALL)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))

    ref1, ref2 = model.forward_pair(img1, img2)

    ctx, state = make_infer_fn(model, data=8 // model_axis, model_axis=model_axis, use_tp=use_tp)
    with ctx.mesh:
        s1, s2 = ctx.shard((img1, img2))
        out1, out2 = ctx.infer(state, s1, s2)

    np.testing.assert_allclose(np.asarray(out1["pts3d"]), np.asarray(ref1["pts3d"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2["conf"]), np.asarray(ref2["conf"]), rtol=1e-4, atol=1e-4)


def test_sharded_inference_int8_scan_matches_unsharded():
    """The production serving stack (int8 trunk + scan layout) must shard.

    int8 outputs cannot be compared bitwise across sharding layouts: the
    batch-8 vs batch-1 XLA tilings reassociate the fp32 LayerNorm
    reductions differently, and a ~1e-7 input difference flips
    round(x/scale) by one quantum (~0.8% of that token's amax) — measured
    eager == jit exactly, while jit-vs-sharded differs only by such flips.
    So this test uses linear (non-exp) adaptor modes, where a quantum flip
    stays ~1% instead of being exp-amplified, and asserts the sharded
    output matches within quant-flip physics; a real sharding bug (wrong
    layout/collective) produces O(1) garbage, far outside this bound."""
    from uniception_tpu.nn.quant import quantize_linears

    model = DUSt3R(
        name="infer_int8",
        depth_mode=("linear", -float("inf"), float("inf")),
        conf_mode=("sigmoid", 0.0, 1.0),
        scan_blocks=True,
        rngs=nnx.Rngs(0),
        **SMALL,
    )
    n_q = quantize_linears(model.encoder, min_params=1) + quantize_linears(model.info_sharing, min_params=1)
    assert n_q > 0

    rng = np.random.RandomState(1)
    img1 = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    ref1, ref2 = model.forward_pair(img1, img2)

    ctx, state = make_infer_fn(model, data=8)
    with ctx.mesh:
        s1, s2 = ctx.shard((img1, img2))
        out1, out2 = ctx.infer(state, s1, s2)

    for a, b in ((out1["pts3d"], ref1["pts3d"]), (out2["conf"], ref2["conf"])):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        rel = np.abs(a - b) / scale
        assert rel.max() < 2e-2, f"beyond quant-flip physics: max {rel.max()} of output scale {scale}"
        assert np.median(rel) < 1e-3, f"systematic divergence: median {np.median(rel)}"


def test_sharded_inference_int8_tp_shards_quantized_params():
    """int8 + TP: Int8Linear w_q/w_scale must actually shard over the model
    axis (TP_RULES w_q rules), not silently replicate, and outputs must
    stay within quant-flip physics of the unsharded forward."""
    from jax.sharding import NamedSharding
    from uniception_tpu.nn.quant import quantize_linears

    model = DUSt3R(
        name="infer_int8_tp",
        depth_mode=("linear", -float("inf"), float("inf")),
        conf_mode=("sigmoid", 0.0, 1.0),
        rngs=nnx.Rngs(0),
        **SMALL,
    )
    n_q = quantize_linears(model.encoder, min_params=1) + quantize_linears(model.info_sharing, min_params=1)
    assert n_q > 0

    rng = np.random.RandomState(2)
    img1 = jnp.asarray(rng.randn(4, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(4, 3, 32, 32).astype(np.float32))
    ref1, ref2 = model.forward_pair(img1, img2)

    ctx, state = make_infer_fn(model, data=4, model_axis=2, use_tp=True)

    # every quantized projection must carry a "model"-sharded w_q
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    w_q_specs = []
    for keypath, leaf in flat:
        path = ".".join(str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", "")))) for k in keypath)
        if path.endswith("w_q.value") and isinstance(getattr(leaf, "sharding", None), NamedSharding):
            w_q_specs.append(tuple(leaf.sharding.spec))
    assert w_q_specs, "no w_q leaves found in sharded state"
    n_model_sharded = sum(1 for spec in w_q_specs if "model" in spec)
    assert n_model_sharded == len(w_q_specs), (
        f"only {n_model_sharded}/{len(w_q_specs)} Int8Linear w_q params are model-sharded"
    )

    with ctx.mesh:
        s1, s2 = ctx.shard((img1, img2))
        out1, out2 = ctx.infer(state, s1, s2)

    for a, b in ((out1["pts3d"], ref1["pts3d"]), (out2["conf"], ref2["conf"])):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        rel = np.abs(a - b) / scale
        assert rel.max() < 2e-2, f"beyond quant-flip physics: max {rel.max()} of output scale {scale}"
        assert np.median(rel) < 1e-3, f"systematic divergence: median {np.median(rel)}"
