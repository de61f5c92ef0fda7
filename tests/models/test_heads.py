"""
MLPFeature / MLPHead / PoseHead / GlobalHead parity vs the torch reference.
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.prediction_heads.base import PredictionHeadInput, PredictionHeadTokenInput
from uniception_tpu.models.prediction_heads.mlp_feature import MLPFeature
from uniception_tpu.models.prediction_heads.mlp_head import MLPHead
from uniception_tpu.models.prediction_heads.pose_head import GlobalHead, PoseHead
from uniception_tpu.utils.torch_compat import load_torch_state_dict

pytestmark = pytest.mark.skipif(not has_reference(), reason="torch reference not available")
add_reference_to_path()


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_mlp_feature_parity():
    import torch
    from uniception.models.prediction_heads.base import PredictionHeadInput as TIn
    from uniception.models.prediction_heads.mlp_feature import MLPFeature as TMLP

    torch.manual_seed(0)
    t = TMLP(input_feature_dim=64, mlp_ratio=2, output_dim=4, patch_size=16)
    t.eval()
    j = MLPFeature(input_feature_dim=64, mlp_ratio=2, output_dim=4, patch_size=16, rngs=nnx.Rngs(0))
    missing, unexpected = load_torch_state_dict(j, _sd(t))
    assert not missing and not unexpected

    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 7, 7).astype(np.float32)
    with torch.no_grad():
        t_out = t(TIn(last_feature=torch.from_numpy(x))).decoded_channels.numpy()
    j_out = np.asarray(j(PredictionHeadInput(last_feature=jnp.asarray(x))).decoded_channels)
    assert t_out.shape == j_out.shape == (2, 4, 112, 112)
    assert np.abs(t_out - j_out).max() < 5e-5


def test_mlp_head_parity():
    import torch
    from uniception.models.prediction_heads.base import PredictionHeadTokenInput as TIn
    from uniception.models.prediction_heads.mlp_head import MLPHead as THead

    torch.manual_seed(0)
    t = THead(input_feature_dim=64, output_dim=3, num_mlp_layers=2, hidden_dim=32)
    t.eval()
    j = MLPHead(input_feature_dim=64, output_dim=3, num_mlp_layers=2, hidden_dim=32, rngs=nnx.Rngs(0))
    missing, unexpected = load_torch_state_dict(j, _sd(t))
    assert not missing and not unexpected

    rng = np.random.RandomState(1)
    x = rng.randn(4, 64, 5).astype(np.float32)
    with torch.no_grad():
        t_out = t(TIn(last_feature=torch.from_numpy(x))).decoded_channels.numpy()
    j_out = np.asarray(j(PredictionHeadTokenInput(last_feature=jnp.asarray(x))).decoded_channels)
    assert t_out.shape == j_out.shape == (4, 3, 5)
    assert np.abs(t_out - j_out).max() < 1e-5


def test_pose_head_parity():
    import torch
    from uniception.models.prediction_heads.base import PredictionHeadInput as TIn
    from uniception.models.prediction_heads.pose_head import PoseHead as THead

    torch.manual_seed(0)
    t = THead(patch_size=8, input_feature_dim=64, num_resconv_block=2, rot_representation_dim=4)
    t.eval()
    j = PoseHead(patch_size=8, input_feature_dim=64, num_resconv_block=2, rot_representation_dim=4, rngs=nnx.Rngs(0))
    missing, unexpected = load_torch_state_dict(j, _sd(t))
    assert not missing and not unexpected

    rng = np.random.RandomState(2)
    x = rng.randn(2, 64, 7, 7).astype(np.float32)
    with torch.no_grad():
        t_out = t(TIn(last_feature=torch.from_numpy(x))).decoded_channels.numpy()
    j_out = np.asarray(j(PredictionHeadInput(last_feature=jnp.asarray(x))).decoded_channels)
    assert t_out.shape == j_out.shape == (2, 7)
    assert np.abs(t_out - j_out).max() < 1e-4


def test_global_head_parity():
    import torch
    from uniception.models.prediction_heads.base import PredictionHeadInput as TIn
    from uniception.models.prediction_heads.global_head import GlobalHead as THead

    torch.manual_seed(0)
    t = THead(patch_size=8, input_feature_dim=64, num_resconv_block=2, output_representation_dim=1)
    t.eval()
    j = GlobalHead(patch_size=8, input_feature_dim=64, num_resconv_block=2, output_representation_dim=1, rngs=nnx.Rngs(0))
    missing, unexpected = load_torch_state_dict(j, _sd(t))
    assert not missing and not unexpected

    rng = np.random.RandomState(3)
    x = rng.randn(2, 64, 7, 7).astype(np.float32)
    with torch.no_grad():
        t_out = t(TIn(last_feature=torch.from_numpy(x))).decoded_channels.numpy()
    j_out = np.asarray(j(PredictionHeadInput(last_feature=jnp.asarray(x))).decoded_channels)
    assert t_out.shape == j_out.shape == (2, 1)
    assert np.abs(t_out - j_out).max() < 1e-4
