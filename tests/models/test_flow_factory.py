"""
UFMFlow composed model (models/factory/flow.py): shape gates, jit, and
numeric parity of the full flow pipeline — encoder -> info-sharing -> DPT
head -> FlowWithConfidenceAdaptor — against the torch reference's own
modules wired the same way (the UFM composition named in the reference
README:167-171; adaptor semantics reference adaptors.py:25-167, 1233-1266).
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.factory.flow import UFMFlow
from uniception_tpu.utils.torch_compat import load_torch_state_dict

SMALL = dict(
    enc_embed_dim=96,
    enc_depth=3,
    enc_num_heads=4,
    info_sharing_dim=64,
    info_sharing_depth=2,
    info_sharing_num_heads=4,
    pred_head_feature_dim=32,
)


def make_model(**over):
    kwargs = dict(name="ufm_small", img_size=(64, 64), **SMALL)
    kwargs.update(over)
    return UFMFlow(rngs=nnx.Rngs(0), **kwargs)


@pytest.mark.parametrize("head", ["dpt", "linear"])
def test_forward_shapes(head):
    model = make_model(pred_head_type=head)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    img2 = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    out = model.forward_pair(img1, img2)
    assert out["flow"].shape == (2, 64, 64, 2)
    assert out["flow_conf"].shape == (2, 64, 64, 1)
    assert float(out["flow_conf"].min()) >= 1.0  # conf mode ('exp', 1, inf)


def test_forward_jits_and_normalized_coordinate_mode():
    model = make_model(pred_head_type="linear", output_normalized_coordinate=True)
    graphdef, state = nnx.split(model)

    @jax.jit
    def step(state, img1, img2):
        m = nnx.merge(graphdef, state)
        return m.forward_pair(img1, img2)

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    img2 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    out = step(state, img1, img2)
    out_e = model.forward_pair(img1, img2)
    # jit fusion changes rounding; the 0.5*(x+1)*W pixel-coordinate scaling
    # amplifies it to ~1e-4 absolute at canvas magnitude (~64 px)
    np.testing.assert_allclose(np.asarray(out["flow"]), np.asarray(out_e["flow"]), atol=1e-3, rtol=1e-5)

    # structural check of the normalized-coordinate math: with an identical
    # model in raw mode (mean 0, std 1, 'none' scaling -> flow == head
    # output x), the normalized mode must equal 0.5*(x+1)*[W,H] + 0.5 minus
    # the (0.5-offset) source coordinate grid (reference adaptors.py:121-167)
    raw = make_model(pred_head_type="linear", flow_mean=(0.0, 0.0), flow_std=(1.0, 1.0),
                     scale_strategy="none")
    x = np.asarray(raw.forward_pair(img1, img2)["flow"])  # (B, H, W, 2) raw head output
    W = H = 64
    wh = np.asarray([W, H], np.float32)
    xs, ys = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    coords = np.stack([xs, ys], -1).astype(np.float32)  # (H, W, 2), xy order
    expected = 0.5 * (x + 1) * wh + 0.5 - coords
    np.testing.assert_allclose(np.asarray(out_e["flow"]), expected, atol=1e-3, rtol=1e-5)


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_flow_pipeline_parity_vs_reference_modules():
    """Wire the torch reference's own modules as a UFM-style flow model
    (CroCo -> MultiViewCrossAttentionTransformerIFR -> DPT -> FlowWith
    ConfidenceAdaptor) and compare the composed forward against UFMFlow."""
    add_reference_to_path()
    import torch
    from uniception.models.encoders.base import ViTEncoderInput as TViTIn
    from uniception.models.encoders.croco import CroCoEncoder as TCroCo
    from uniception.models.info_sharing.base import MultiViewTransformerInput as TMVIn
    from uniception.models.info_sharing.cross_attention_transformer import (
        MultiViewCrossAttentionTransformerIFR as TMVCATIFR,
    )
    from uniception.models.libs.croco.pos_embed import RoPE2D as TRoPE
    from uniception.models.prediction_heads.adaptors import FlowWithConfidenceAdaptor as TAdaptor
    from uniception.models.prediction_heads.base import AdaptorInput as TAdaptorIn
    from uniception.models.prediction_heads.base import PredictionHeadLayeredInput as TLayeredIn
    from uniception.models.prediction_heads.dpt import DPTFeature as TDPTFeature
    from uniception.models.prediction_heads.dpt import DPTRegressionProcessor as TDPTRegressor

    torch.manual_seed(0)
    rope = TRoPE(freq=100.0)
    t_enc = TCroCo(
        name="ufm_small", data_norm_type="dust3r", patch_embed_cls="PatchEmbedDust3R",
        img_size=(64, 64), patch_size=16, enc_embed_dim=96, enc_depth=3, enc_num_heads=4,
    )
    t_info = TMVCATIFR(
        name="base_info_sharing", input_embed_dim=96, num_views=2, depth=2, dim=64, num_heads=4,
        custom_positional_encoding=rope, indices=[0, 1], norm_intermediate=False,
    )
    t_feat = TDPTFeature(
        patch_size=16, hooks=[0, 1, 2, 3], input_feature_dims=[96, 64, 64, 64], feature_dim=32
    )
    t_reg = TDPTRegressor(input_feature_dim=32, output_dim=3)
    t_adaptor = TAdaptor(
        name="flow", flow_mean=(0.5, -0.25), flow_std=(2.0, 3.0), base_shape=(32, 32),
        scale_strategy="scale_both", output_normalized_coordinate=False,
        confidence_type="exp", vmin=1, vmax=float("inf"),
    )
    for m in (t_enc, t_info, t_feat, t_reg):
        m.eval()

    j_model = make_model(
        pred_head_type="dpt",
        flow_mean=(0.5, -0.25), flow_std=(2.0, 3.0), flow_base_shape=(32, 32),
        scale_strategy="scale_both",
    )
    # the small 2-deep info-sharing uses hooks [0, depth//2] = [0, 1]
    assert j_model.info_sharing.indices == [0, 1]

    sd = {}
    for prefix, mod in [
        ("encoder", t_enc), ("info_sharing", t_info),
        ("dpt_feature_head", t_feat), ("dpt_regressor_head", t_reg),
    ]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    from uniception_tpu.models.prediction_heads.dpt import DPT_CHECKPOINT_ALIASES

    missing, unexpected = load_torch_state_dict(j_model, sd, ignore=DPT_CHECKPOINT_ALIASES)
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(7)
    img1 = rng.randn(2, 3, 64, 64).astype(np.float32)
    img2 = rng.randn(2, 3, 64, 64).astype(np.float32)

    with torch.no_grad():
        f1 = t_enc(TViTIn(image=torch.from_numpy(img1), data_norm_type="dust3r")).features
        f2 = t_enc(TViTIn(image=torch.from_numpy(img2), data_norm_type="dust3r")).features
        final, intermediate = t_info(TMVIn(features=[f1, f2]))
        layered = [
            f1.float(),
            intermediate[0].features[0].float(),
            intermediate[1].features[0].float(),
            final.features[0].float(),
        ]
        feats = t_feat(TLayeredIn(list_features=layered, target_output_shape=(64, 64)))
        head_out = t_reg(feats)
        o = t_adaptor(TAdaptorIn(adaptor_feature=head_out.decoded_channels, output_shape_hw=(64, 64)))
        t_flow = o.value.permute(0, 2, 3, 1).numpy()
        t_conf = o.confidence.permute(0, 2, 3, 1).numpy()

    out = j_model.forward_pair(jnp.asarray(img1), jnp.asarray(img2))
    # reference golden-gate thresholds (examples/models/dust3r/dust3r.py:230)
    assert np.abs(t_flow - np.asarray(out["flow"])).max() < 1e-2
    assert np.abs(t_conf - np.asarray(out["flow_conf"])).max() < 1e-2
    # block-level expectation is much tighter
    assert np.abs(t_flow - np.asarray(out["flow"])).max() < 1e-4
    assert np.abs(t_conf - np.asarray(out["flow_conf"])).max() < 1e-4


def test_flow_confidence_loss_trains_ufm():
    "flow_confidence_loss: masked math is exact, and one adamw step on UFMFlow moves every param with finite grads."
    import optax

    from uniception_tpu.parallel.training import flow_confidence_loss

    # masked-math check against a hand computation
    flow = jnp.zeros((1, 2, 2, 2))
    tgt = jnp.ones((1, 2, 2, 2))
    conf = jnp.full((1, 2, 2, 1), 2.0)
    valid = jnp.asarray([[[True, False], [True, True]]])
    out = {"flow": flow, "flow_conf": conf}
    expected = 2.0 * np.sqrt(2.0) - 0.2 * np.log(2.0)  # per valid px, averaged
    got = float(flow_confidence_loss(out, tgt, valid=valid))
    np.testing.assert_allclose(got, expected, rtol=1e-6)

    model = make_model(pred_head_type="linear")
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    img2 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    target = jnp.asarray(rng.randn(1, 64, 64, 2).astype(np.float32))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(params):
            out = nnx.merge(graphdef, params, rest).forward_pair(img1, img2)
            return flow_confidence_loss(out, target)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, grads

    new_params, _, loss, grads = step(params, opt_state)
    assert np.isfinite(float(loss))
    finite = [bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads)]
    assert all(finite)
    # every head/adaptor-path param moved (encoder params all get grads too)
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), params, new_params)
    assert max(jax.tree.leaves(deltas)) > 0
