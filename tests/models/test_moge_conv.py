"""
MoGe conv decoder head parity vs the torch reference (replicate padding,
UV-plane concat, GroupNorm residual blocks, deconv upsamplers).
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.prediction_heads.base import PredictionHeadLayeredInput
from uniception_tpu.models.prediction_heads.moge_conv import MoGeConvFeature, normalized_view_plane_uv
from uniception_tpu.utils.torch_compat import load_torch_state_dict

pytestmark = pytest.mark.skipif(not has_reference(), reason="torch reference not available")
add_reference_to_path()


def test_uv_plane_matches():
    import torch
    from uniception.models.prediction_heads.moge_conv import normalized_view_plane_uv as t_uv

    t = t_uv(width=10, height=6, aspect_ratio=1.5).numpy()
    j = np.asarray(normalized_view_plane_uv(10, 6, aspect_ratio=1.5))
    assert np.abs(t - j).max() < 1e-6


def test_moge_conv_parity():
    import torch
    from uniception.models.prediction_heads.base import PredictionHeadLayeredInput as TIn
    from uniception.models.prediction_heads.moge_conv import MoGeConvFeature as TMoGe

    torch.manual_seed(0)
    kwargs = dict(
        patch_size=14,
        num_features=2,
        input_feature_dims=[96, 64],
        dim_out=[2, 1],
        dim_proj=64,
        dim_upsample=[48, 32, 32],
        dim_times_res_block_hidden=2,
        num_res_blocks=1,
        res_block_norm="group_norm",
        last_res_blocks=1,
        last_conv_channels=32,
        last_conv_size=1,
    )
    t = TMoGe(**kwargs)
    t.eval()
    j = MoGeConvFeature(rngs=nnx.Rngs(0), **kwargs)
    missing, unexpected = load_torch_state_dict(j, {k: v.detach().numpy() for k, v in t.state_dict().items()})
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(0)
    feats = [rng.randn(1, c, 4, 6).astype(np.float32) for c in [96, 64]]
    target = (56, 84)
    with torch.no_grad():
        t_out = t(TIn(list_features=[torch.from_numpy(f) for f in feats], target_output_shape=target))
    j_out = j(PredictionHeadLayeredInput(list_features=[jnp.asarray(f) for f in feats], target_output_shape=target))
    t_arr = t_out.decoded_channels.numpy()
    j_arr = np.asarray(j_out.decoded_channels)
    assert t_arr.shape == j_arr.shape == (1, 3, 56, 84)
    err = np.abs(t_arr - j_arr).max()
    assert err < 5e-5, f"max abs err {err}"
