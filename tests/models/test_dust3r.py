"""
DUSt3R composed model: end-to-end shape gates, symmetrized-batch dedup, and
numeric parity of the full pipeline against the torch reference modules
wired exactly as reference factory/dust3r.py does (small config so the test
runs on CPU in seconds; the full-size golden gate runs with converted
checkpoints when available).
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.factory.dust3r import DUSt3R, interleave, is_symmetrized
from uniception_tpu.utils.torch_compat import load_torch_state_dict

SMALL = dict(
    enc_embed_dim=96,
    enc_depth=3,
    enc_num_heads=4,
    info_sharing_dim=64,
    info_sharing_depth=2,
    info_sharing_num_heads=4,
)


def make_model(**over):
    kwargs = dict(name="dust3r_small", img_size=(64, 64), **SMALL)
    kwargs.update(over)
    return DUSt3R(rngs=nnx.Rngs(0), **kwargs)


def test_forward_shapes_linear():
    model = make_model()
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    img2 = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    res1, res2 = model.forward_pair(img1, img2)
    assert res1["pts3d"].shape == (2, 64, 64, 3)
    assert res1["conf"].shape == (2, 64, 64, 1)
    assert res2["pts3d_in_other_view"].shape == (2, 64, 64, 3)
    # conf mode ('exp', 1, inf): confidences >= 1
    assert float(res1["conf"].min()) >= 1.0


def test_forward_jits():
    model = make_model()
    graphdef, state = nnx.split(model)

    @jax.jit
    def step(state, img1, img2):
        m = nnx.merge(graphdef, state)
        return m.forward_pair(img1, img2)

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    img2 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    res1, _ = step(state, img1, img2)
    res1e, _ = model.forward_pair(img1, img2)
    assert np.allclose(np.asarray(res1["pts3d"]), np.asarray(res1e["pts3d"]), atol=1e-5)


def test_symmetrized_dedup_matches_full():
    model = make_model()
    rng = np.random.RandomState(1)
    a = rng.randn(1, 3, 64, 64).astype(np.float32)
    b = rng.randn(1, 3, 64, 64).astype(np.float32)
    # symmetrized batch: (a, b) and (b, a)
    img1 = jnp.asarray(np.concatenate([a, b], 0))
    img2 = jnp.asarray(np.concatenate([b, a], 0))
    view1 = {"img": img1, "instance": ["0", "1"], "data_norm_type": "dust3r"}
    view2 = {"img": img2, "instance": ["1", "0"], "data_norm_type": "dust3r"}
    assert is_symmetrized(view1, view2)

    res1_sym, res2_sym = model(view1, view2)
    res1_full, res2_full = model.forward_pair(img1, img2)
    # the deduped path encodes a different batch size; XLA fusion changes
    # rounding, and the exp pointmap activation amplifies it
    np.testing.assert_allclose(np.asarray(res1_sym["pts3d"]), np.asarray(res1_full["pts3d"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res2_sym["pts3d_in_other_view"]), np.asarray(res2_full["pts3d_in_other_view"]), rtol=1e-4, atol=1e-4
    )


def test_interleave():
    t1 = jnp.asarray(np.arange(4).reshape(2, 2))
    t2 = jnp.asarray(np.arange(4, 8).reshape(2, 2))
    r1, r2 = interleave(t1, t2)
    assert r1.shape == (4, 2)
    assert np.array_equal(np.asarray(r1), [[0, 1], [4, 5], [2, 3], [6, 7]])
    assert np.array_equal(np.asarray(r2), [[4, 5], [0, 1], [6, 7], [2, 3]])


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_full_pipeline_parity_vs_reference_modules():
    """Wire the torch reference's own modules exactly as its DUSt3R factory
    does (factory/dust3r.py:110-203, small sizes) and compare the composed
    forward against our DUSt3R."""
    add_reference_to_path()
    import torch
    from uniception.models.encoders.base import ViTEncoderInput as TViTIn
    from uniception.models.encoders.croco import CroCoEncoder as TCroCo
    from uniception.models.info_sharing.base import MultiViewTransformerInput as TMVIn
    from uniception.models.info_sharing.cross_attention_transformer import (
        MultiViewCrossAttentionTransformer as TMVCAT,
    )
    from uniception.models.libs.croco.pos_embed import RoPE2D as TRoPE
    from uniception.models.prediction_heads.adaptors import PointMapWithConfidenceAdaptor as TAdaptor
    from uniception.models.prediction_heads.base import AdaptorInput as TAdaptorIn
    from uniception.models.prediction_heads.base import PredictionHeadInput as THeadIn
    from uniception.models.prediction_heads.linear import LinearFeature as TLinear

    torch.manual_seed(0)
    rope = TRoPE(freq=100.0)
    t_enc = TCroCo(
        name="dust3r_small", data_norm_type="dust3r", patch_embed_cls="PatchEmbedDust3R", img_size=(64, 64),
        patch_size=16, enc_embed_dim=96, enc_depth=3, enc_num_heads=4,
    )
    t_info = TMVCAT(
        name="base_info_sharing", input_embed_dim=96, num_views=2, depth=2, dim=64, num_heads=4,
        custom_positional_encoding=rope,
    )
    t_head1 = TLinear(input_feature_dim=64, output_dim=4, patch_size=16)
    t_head2 = TLinear(input_feature_dim=64, output_dim=4, patch_size=16)
    t_adaptor = TAdaptor(
        name="pointmap", pointmap_mode="exp", pointmap_vmin=-float("inf"), pointmap_vmax=float("inf"),
        confidence_type="exp", confidence_vmin=1, confidence_vmax=float("inf"),
    )
    for m in (t_enc, t_info, t_head1, t_head2):
        m.eval()

    j_model = make_model()
    sd = {}
    for prefix, mod in [("encoder", t_enc), ("info_sharing", t_info), ("head1", t_head1), ("head2", t_head2)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    missing, unexpected = load_torch_state_dict(j_model, sd)
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(7)
    img1 = rng.randn(2, 3, 64, 64).astype(np.float32)
    img2 = rng.randn(2, 3, 64, 64).astype(np.float32)

    with torch.no_grad():
        f1 = t_enc(TViTIn(image=torch.from_numpy(img1), data_norm_type="dust3r")).features
        f2 = t_enc(TViTIn(image=torch.from_numpy(img2), data_norm_type="dust3r")).features
        dec = t_info(TMVIn(features=[f1, f2]))
        h1 = t_head1(THeadIn(last_feature=dec.features[0].float()))
        h2 = t_head2(THeadIn(last_feature=dec.features[1].float()))
        o1 = t_adaptor(TAdaptorIn(adaptor_feature=h1.decoded_channels, output_shape_hw=(64, 64)))
        o2 = t_adaptor(TAdaptorIn(adaptor_feature=h2.decoded_channels, output_shape_hw=(64, 64)))
        t_pts1 = o1.value.permute(0, 2, 3, 1).numpy()
        t_conf1 = o1.confidence.permute(0, 2, 3, 1).numpy()
        t_pts2 = o2.value.permute(0, 2, 3, 1).numpy()

    res1, res2 = j_model.forward_pair(jnp.asarray(img1), jnp.asarray(img2))
    # thresholds from the reference's own golden gate (examples/models/dust3r/dust3r.py:230)
    assert np.abs(t_pts1 - np.asarray(res1["pts3d"])).max() < 1e-2
    assert np.abs(t_conf1 - np.asarray(res1["conf"])).max() < 1e-2
    assert np.abs(t_pts2 - np.asarray(res2["pts3d_in_other_view"])).max() < 1e-2
    # block-level expectation is much tighter
    assert np.abs(t_pts1 - np.asarray(res1["pts3d"])).max() < 1e-4
