"""
Adaptor family parity vs the torch reference: activation/unnormalization
semantics for every major family and its modes (reference
prediction_heads/adaptors.py:25-2252), plus AdaptorMap channel slicing.
Outputs are compared field-by-field on the returned dataclasses.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="torch reference not available")
add_reference_to_path()


def _fields(out):
    if dataclasses.is_dataclass(out):
        return {f.name: getattr(out, f.name) for f in dataclasses.fields(out)}
    return dict(vars(out))


def _compare(t_out, j_out, label, tol=5e-5):
    import torch

    t_f, j_f = _fields(t_out), _fields(j_out)
    assert set(t_f) == set(j_f), f"{label}: fields {set(t_f)} vs {set(j_f)}"
    for k in t_f:
        tv, jv = t_f[k], j_f[k]
        if isinstance(tv, torch.Tensor):
            # rtol matters: e.g. Covariance2D inv_covariance spans ~1e6 when
            # tanh saturates; absolute diffs there are pure float noise
            np.testing.assert_allclose(np.asarray(jv), tv.detach().numpy(), rtol=1e-4, atol=tol, err_msg=f"{label}.{k}")
        elif dataclasses.is_dataclass(tv) or hasattr(tv, "__dict__"):
            _compare(tv, jv, f"{label}.{k}", tol)


CASES = [
    # (class name, ctor kwargs, channels)
    ("ScaleAdaptor", dict(mode="exp"), 1),
    ("ScaleAdaptor", dict(mode="linear", vmin=0.0, vmax=10.0), 1),
    ("DepthAdaptor", dict(mode="exp"), 1),
    ("DepthAdaptor", dict(mode="square"), 1),
    ("SceneFlowAdaptor", dict(mode="linear"), 3),
    ("PointMapAdaptor", dict(mode="linear"), 3),
    ("PointMapAdaptor", dict(mode="square"), 3),
    ("PointMapAdaptor", dict(mode="exp"), 3),
    ("RayOriginsAdaptor", dict(mode="linear"), 3),
    ("RayDirectionsAdaptor", dict(mode="linear", normalize_to_unit_sphere=True, normalize_to_unit_image_plane=False), 3),
    ("RayDirectionsAdaptor", dict(mode="linear", normalize_to_unit_sphere=False, normalize_to_unit_image_plane=True, clamp_min_of_z_dir=True), 3),
    ("CamTranslationAdaptor", dict(mode="linear"), 3),
    ("QuaternionsAdaptor", dict(mode="linear", normalize=True), 4),
    ("ConfidenceAdaptor", dict(confidence_type="exp", vmin=1.0, vmax=float("inf")), 1),
    ("ConfidenceAdaptor", dict(confidence_type="sigmoid", vmin=0.0, vmax=1.0), 1),
    ("MaskAdaptor", dict(), 1),
    ("Covariance2DAdaptor", dict(parametrization="exp_tanh"), 3),
    ("FlowAdaptor", dict(flow_mean=(0.1, -0.2), flow_std=(2.0, 3.0), base_shape=(16, 16), scale_strategy="none"), 2),
    ("FlowAdaptor", dict(flow_mean=(0.0, 0.0), flow_std=(1.0, 1.0), base_shape=(16, 16), scale_strategy="scale_width"), 2),
]


@pytest.mark.parametrize("cls_name,kwargs,channels", CASES, ids=[f"{c}-{i}" for i, (c, _, _) in enumerate(CASES)])
def test_adaptor_parity(cls_name, kwargs, channels):
    import torch
    import uniception.models.prediction_heads.adaptors as t_adaptors
    from uniception.models.prediction_heads.base import AdaptorInput as TIn

    import uniception_tpu.models.prediction_heads.adaptors as j_adaptors
    from uniception_tpu.models.prediction_heads.base import AdaptorInput

    t_mod = getattr(t_adaptors, cls_name)(name="a", **kwargs)
    j_mod = getattr(j_adaptors, cls_name)(name="a", **kwargs)

    rng = np.random.RandomState(0)
    x = rng.randn(2, channels, 16, 16).astype(np.float32)
    with torch.no_grad():
        t_out = t_mod(TIn(adaptor_feature=torch.from_numpy(x), output_shape_hw=(16, 16)))
    j_out = j_mod(AdaptorInput(adaptor_feature=jnp.asarray(x), output_shape_hw=(16, 16)))
    _compare(t_out, j_out, cls_name)


def test_adaptor_map_slicing_parity():
    import torch
    import uniception.models.prediction_heads.adaptors as t_adaptors
    from uniception.models.prediction_heads.base import AdaptorMap as TMap

    import uniception_tpu.models.prediction_heads.adaptors as j_adaptors
    from uniception_tpu.models.prediction_heads.base import AdaptorInput, AdaptorMap

    t_map = TMap(t_adaptors.PointMapAdaptor(name="pts", mode="exp"), t_adaptors.ConfidenceAdaptor(name="conf", confidence_type="exp", vmin=1.0, vmax=float("inf")))
    j_map = AdaptorMap(j_adaptors.PointMapAdaptor(name="pts", mode="exp"), j_adaptors.ConfidenceAdaptor(name="conf", confidence_type="exp", vmin=1.0, vmax=float("inf")))

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)  # 3 pointmap + 1 conf channels
    # the reference AdaptorMap reads `.decoded_channels` off its input
    # (base.py:203); mirror that shape of input on the torch side
    from types import SimpleNamespace

    with torch.no_grad():
        t_out = t_map(SimpleNamespace(decoded_channels=torch.from_numpy(x)))
    j_out = j_map(AdaptorInput(adaptor_feature=jnp.asarray(x), output_shape_hw=(8, 8)))
    assert set(t_out.keys()) == set(j_out.keys()) == {"pts", "conf"}
    for k in t_out:
        _compare(t_out[k], j_out[k], f"map.{k}")


def test_adaptor_map_accepts_head_output():
    "AdaptorMap also takes head outputs exposing .decoded_channels (reference contract)."
    from types import SimpleNamespace

    import uniception_tpu.models.prediction_heads.adaptors as j_adaptors
    from uniception_tpu.models.prediction_heads.base import AdaptorMap

    j_map = AdaptorMap(j_adaptors.DepthAdaptor(name="d", mode="exp"))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 4, 4).astype(np.float32))
    out = j_map(SimpleNamespace(decoded_channels=x))
    assert out["d"].value.shape == (1, 1, 4, 4)


_RD = dict(ray_directions_mode="linear", ray_directions_normalize_to_unit_sphere=True,
           ray_directions_normalize_to_unit_image_plane=False, ray_directions_vmin=-np.inf,
           ray_directions_vmax=np.inf, ray_directions_clamp_min_of_z_dir=False, ray_directions_z_dir_min=1.0)
COMPOSITE_CASES = [
    ("PointMapWithConfidenceAdaptor",
     dict(pointmap_mode="exp", pointmap_vmin=-np.inf, pointmap_vmax=np.inf,
          confidence_type="exp", confidence_vmin=1.0, confidence_vmax=np.inf), 4),
    ("RayDirectionsPlusDepthAdaptor",
     dict(_RD, depth_mode="exp", depth_vmin=0.0, depth_vmax=np.inf), 4),
    ("CamTranslationPlusQuatsAdaptor",
     dict(cam_trans_mode="linear", cam_trans_vmin=-np.inf, cam_trans_vmax=np.inf,
          quaternions_mode="linear", quaternions_normalize=True, quaternions_vmin=-np.inf,
          quaternions_vmax=np.inf), 7),
    ("RayMapAdaptor",
     dict(_RD, ray_origins_mode="linear", ray_origins_vmin=-np.inf, ray_origins_vmax=np.inf), 6),
    ("RayMapPlusDepthAdaptor",
     dict(_RD, ray_origins_mode="linear", ray_origins_vmin=-np.inf, ray_origins_vmax=np.inf,
          depth_mode="exp", depth_vmin=0.0, depth_vmax=np.inf), 7),
]


@pytest.mark.parametrize("cls_name,kwargs,channels", COMPOSITE_CASES, ids=[c for c, _, _ in COMPOSITE_CASES])
def test_composite_adaptor_parity(cls_name, kwargs, channels):
    import torch
    import uniception.models.prediction_heads.adaptors as t_adaptors
    from uniception.models.prediction_heads.base import AdaptorInput as TIn

    import uniception_tpu.models.prediction_heads.adaptors as j_adaptors
    from uniception_tpu.models.prediction_heads.base import AdaptorInput

    try:
        t_mod = getattr(t_adaptors, cls_name)(name="a", **kwargs)
    except TypeError as e:
        pytest.skip(f"reference ctor mismatch for {cls_name}: {e}")
    j_mod = getattr(j_adaptors, cls_name)(name="a", **kwargs)

    rng = np.random.RandomState(0)
    x = rng.randn(2, channels, 8, 8).astype(np.float32)
    with torch.no_grad():
        t_out = t_mod(TIn(adaptor_feature=torch.from_numpy(x), output_shape_hw=(8, 8)))
    j_out = j_mod(AdaptorInput(adaptor_feature=jnp.asarray(x), output_shape_hw=(8, 8)))
    _compare(t_out, j_out, cls_name)
