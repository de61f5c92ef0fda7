"""
DPT head parity vs the torch reference: resize op semantics, DPTFeature
fusion pyramid, regression/segmentation processors, double-upsampling
variant — including the ConvTranspose weight-layout translation.
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.prediction_heads.base import PredictionHeadLayeredInput
from uniception_tpu.models.prediction_heads.dpt import (
    DPTFeature,
    DPTFeatureDoubleUpsampling,
    DPTRegressionProcessor,
    DPTSegmentationProcessor,
)
from uniception_tpu.ops.resize import interpolate
from uniception_tpu.models.prediction_heads.dpt import DPT_CHECKPOINT_ALIASES
from uniception_tpu.nn.dpt_parts import DPT_ADAPTER_CHECKPOINT_ALIASES
from uniception_tpu.utils.torch_compat import load_torch_state_dict

pytestmark = pytest.mark.skipif(not has_reference(), reason="torch reference not available")
add_reference_to_path()


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


@pytest.mark.parametrize("mode,align", [("bilinear", True), ("bilinear", False), ("bicubic", False), ("bicubic", True)])
@pytest.mark.parametrize("shape", [((7, 9), (14, 18)), ((8, 8), (17, 13)), ((16, 12), (8, 6))])
def test_interpolate_matches_torch(mode, align, shape):
    import torch
    import torch.nn.functional as F

    (h, w), (ho, wo) = shape
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, h, w).astype(np.float32)
    t = F.interpolate(torch.from_numpy(x), size=(ho, wo), mode=mode, align_corners=align).numpy()
    j = np.asarray(interpolate(jnp.asarray(x), size=(ho, wo), mode=mode, align_corners=align))
    err = np.abs(t - j).max()
    assert err < 1e-5, f"{mode} align={align} {shape}: {err}"


def test_dpt_feature_parity():
    import torch
    from uniception.models.prediction_heads.base import PredictionHeadLayeredInput as TIn
    from uniception.models.prediction_heads.dpt import DPTFeature as TDPT

    torch.manual_seed(0)
    kwargs = dict(
        patch_size=16, hooks=[0, 1, 2, 3], input_feature_dims=[96, 64, 64, 64],
        layer_dims=[48, 48, 48, 48], feature_dim=32,
    )
    t = TDPT(**kwargs)
    t.eval()
    j = DPTFeature(rngs=nnx.Rngs(0), **kwargs)
    missing, unexpected = load_torch_state_dict(j, _sd(t), strict=True, ignore=DPT_CHECKPOINT_ALIASES)
    assert not missing

    rng = np.random.RandomState(1)
    feats = [rng.randn(2, c, 8, 8).astype(np.float32) for c in [96, 64, 64, 64]]
    with torch.no_grad():
        t_out = t(TIn(list_features=[torch.from_numpy(f) for f in feats], target_output_shape=(128, 128)))
    j_out = j(PredictionHeadLayeredInput(list_features=[jnp.asarray(f) for f in feats], target_output_shape=(128, 128)))

    err = np.abs(t_out.features_upsampled_8x.numpy() - np.asarray(j_out.features_upsampled_8x)).max()
    assert err < 5e-5, f"max abs err {err}"
    assert j_out.features_upsampled_8x.shape == (2, 32, 64, 64)


def test_dpt_regression_processor_parity():
    import torch
    from uniception.models.prediction_heads.dpt import DPTFeatureInput as TFeatIn
    from uniception.models.prediction_heads.dpt import DPTRegressionProcessor as TProc

    torch.manual_seed(0)
    t = TProc(input_feature_dim=32, output_dim=4)
    t.eval()
    j = DPTRegressionProcessor(input_feature_dim=32, output_dim=4, rngs=nnx.Rngs(0))
    missing, unexpected = load_torch_state_dict(j, _sd(t), strict=True, ignore=DPT_CHECKPOINT_ALIASES)
    assert not missing and not unexpected

    rng = np.random.RandomState(2)
    x = rng.randn(2, 32, 24, 24).astype(np.float32)
    with torch.no_grad():
        t_out = t(TFeatIn(features_upsampled_8x=torch.from_numpy(x), target_output_shape=(50, 50)))
    from uniception_tpu.models.prediction_heads.dpt import DPTFeatureInput

    j_out = j(DPTFeatureInput(features_upsampled_8x=jnp.asarray(x), target_output_shape=(50, 50)))
    err = np.abs(t_out.decoded_channels.numpy() - np.asarray(j_out.decoded_channels)).max()
    assert err < 5e-5, f"max abs err {err}"


def test_dpt_segmentation_processor_parity():
    import torch
    from uniception.models.prediction_heads.dpt import DPTFeatureInput as TFeatIn
    from uniception.models.prediction_heads.dpt import DPTSegmentationProcessor as TProc

    torch.manual_seed(0)
    t = TProc(input_feature_dim=32, output_dim=2)
    t.eval()
    j = DPTSegmentationProcessor(input_feature_dim=32, output_dim=2, rngs=nnx.Rngs(0))
    load_torch_state_dict(j, _sd(t), strict=True, ignore=DPT_CHECKPOINT_ALIASES)

    rng = np.random.RandomState(3)
    x = rng.randn(1, 32, 16, 16).astype(np.float32)
    with torch.no_grad():
        t_out = t(TFeatIn(features_upsampled_8x=torch.from_numpy(x), target_output_shape=(33, 33)))
    from uniception_tpu.models.prediction_heads.dpt import DPTFeatureInput

    j_out = j(DPTFeatureInput(features_upsampled_8x=jnp.asarray(x), target_output_shape=(33, 33)))
    err = np.abs(t_out.decoded_channels.numpy() - np.asarray(j_out.decoded_channels)).max()
    assert err < 5e-5, f"max abs err {err}"


def test_dpt_double_upsampling_parity():
    import torch
    from uniception.models.prediction_heads.base import PredictionHeadLayeredInput as TIn
    from uniception.models.prediction_heads.dpt import DPTFeatureDoubleUpsampling as TDPT

    torch.manual_seed(0)
    kwargs = dict(hooks=[0, 1], input_feature_dims=[64, 64], layer_dims=[48, 64], feature_dim=32)
    t = TDPT(**kwargs)
    t.eval()
    j = DPTFeatureDoubleUpsampling(rngs=nnx.Rngs(0), **kwargs)
    missing, _ = load_torch_state_dict(j, _sd(t), strict=True, ignore=DPT_CHECKPOINT_ALIASES)
    assert not missing

    rng = np.random.RandomState(4)
    feats = [rng.randn(1, 64, 8, 8).astype(np.float32) for _ in range(2)]
    with torch.no_grad():
        t_out = t(TIn(list_features=[torch.from_numpy(f) for f in feats], target_output_shape=(128, 128)))
    j_out = j(PredictionHeadLayeredInput(list_features=[jnp.asarray(f) for f in feats], target_output_shape=(128, 128)))
    err = np.abs(t_out.features_upsampled_8x.numpy() - np.asarray(j_out.features_upsampled_8x)).max()
    assert err < 5e-5, f"max abs err {err}"


@pytest.mark.parametrize("head_type", ["regression", pytest.param("semseg", marks=pytest.mark.slow)])
def test_dpt_output_adapter_parity(head_type):
    import torch
    from uniception.models.libs.croco.dpt_block import DPTOutputAdapter as TAdapter

    from uniception_tpu.nn.dpt_parts import DPTOutputAdapter

    cfg = dict(
        num_channels=2,
        stride_level=1,
        patch_size=16,
        hooks=[0, 1, 2, 3],
        layer_dims=[16, 24, 32, 48],
        feature_dim=24,
        last_dim=8,
        dim_tokens_enc=40,
        head_type=head_type,
    )
    torch.manual_seed(0)
    t_mod = TAdapter(**cfg)
    t_mod.eval()
    j_mod = DPTOutputAdapter(rngs=nnx.Rngs(0), **cfg)
    missing, _ = load_torch_state_dict(j_mod, _sd(t_mod), strict=True, ignore=DPT_ADAPTER_CHECKPOINT_ALIASES)
    assert not missing

    # patch grid must be even and square-compatible: the reference's own
    # fixed 2x upsample chain requires N_H, N_W divisible by 2
    H, W = 64, 64
    rng = np.random.RandomState(3)
    tokens = [rng.randn(2, (H // 16) * (W // 16), 40).astype(np.float32) for _ in range(4)]
    with torch.no_grad():
        t_out = t_mod([torch.from_numpy(t) for t in tokens], (H, W)).numpy()
    j_out = np.asarray(j_mod([jnp.asarray(t) for t in tokens], (H, W)))
    assert t_out.shape == j_out.shape
    err = np.abs(t_out - j_out).max()
    assert err < 2e-4, f"{head_type} err {err}"


@pytest.mark.slow
def test_dpt_feature_checkpoint_gradient_matches():
    "checkpoint_gradient must not change outputs or grads."
    import jax

    from uniception_tpu.models.prediction_heads.dpt import DPTFeature

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, 32, 4, 4).astype(np.float32)) for _ in range(4)]
    cfg = dict(patch_size=16, hooks=[0, 1, 2, 3], input_feature_dims=[32] * 4, layer_dims=[16, 24, 32, 48], feature_dim=24)

    def run(ckpt):
        head = DPTFeature(checkpoint_gradient=ckpt, rngs=nnx.Rngs(0), **cfg)
        graphdef, state = nnx.split(head)

        def loss(state):
            out = nnx.merge(graphdef, state)(PredictionHeadLayeredInput(list_features=feats, target_output_shape=None))
            return (out.features_upsampled_8x ** 2).mean()

        return jax.value_and_grad(loss)(state)

    (l0, g0), (l1, g1) = run(False), run(True)
    assert abs(float(l0) - float(l1)) < 1e-7
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_dpt_regression_processor_checkpoint_gradient_matches():
    "Processor remat (reference dpt.py:269-311 checkpoints it too) is bit-exact."
    import jax

    from uniception_tpu.models.prediction_heads.dpt import DPTFeatureInput, DPTRegressionProcessor

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 24, 8, 8).astype(np.float32))

    def run(ckpt):
        proc = DPTRegressionProcessor(
            input_feature_dim=24, output_dim=3, checkpoint_gradient=ckpt, rngs=nnx.Rngs(0)
        )
        graphdef, state = nnx.split(proc)

        def loss(state):
            out = nnx.merge(graphdef, state)(
                DPTFeatureInput(features_upsampled_8x=x, target_output_shape=(16, 16))
            )
            return (out.decoded_channels ** 2).mean()

        return jax.value_and_grad(loss)(state)

    (l0, g0), (l1, g1) = run(False), run(True)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_factory_head_gradient_checkpointing_propagates():
    "DUSt3R(head_gradient_checkpointing=...) reaches all four DPT modules; default follows gradient_checkpointing."
    from uniception_tpu.models.factory.dust3r import DUSt3R

    def build(**kw):
        return DUSt3R(
            name="t", img_size=(32, 32), pred_head_type="dpt",
            enc_embed_dim=32, enc_depth=1, enc_num_heads=2,
            info_sharing_dim=32, info_sharing_depth=9, info_sharing_num_heads=2,
            rngs=nnx.Rngs(0), **kw,
        )

    m = build(head_gradient_checkpointing=True)
    assert m.dpt_feature_head1.checkpoint_gradient and m.dpt_feature_head2.checkpoint_gradient
    assert m.dpt_regressor_head1.checkpoint_gradient and m.dpt_regressor_head2.checkpoint_gradient
    assert not m.encoder.gradient_checkpointing

    m = build(gradient_checkpointing=True, head_gradient_checkpointing=False)
    assert not m.dpt_feature_head1.checkpoint_gradient
    assert not m.dpt_regressor_head1.checkpoint_gradient
