"""
Task adaptors: activation/unnormalization from decoded channels to physical
quantities.

Behavioral parity with reference
uniception/models/prediction_heads/adaptors.py:25-2252 — the complete
family: Flow, Scale, Depth, SceneFlow, PointMap, RayOrigins, RayDirections,
CamTranslation, Quaternions, RayMap, Confidence, Covariance2D, Mask, all the
"Plus" channel-concatenation composites, and the ValueWith{Confidence, Mask,
ConfidenceAndMask} cross-products.

All adaptors are stateless elementwise math over (B, C, H, W) arrays
(except FlowAdaptor's buffers), so XLA fuses each one into the producing
head's epilogue. The composites here are generated from a parametrization
table rather than hand-expanded, but expose the reference's exact class
names and constructor signatures.
"""

import math
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from uniception_tpu.models.prediction_heads.base import (
    AdaptorInput,
    AdaptorOutput,
    Covariance2DAdaptorOutput,
    MaskAdaptorOutput,
    RegressionAdaptorOutput,
    RegressionWithConfidenceAdaptorOutput,
    RegressionWithConfidenceAndMaskAdaptorOutput,
    RegressionWithMaskAdaptorOutput,
    UniCeptionAdaptorBase,
)

__all__ = [
    "FlowAdaptor",
    "ScaleAdaptor",
    "DepthAdaptor",
    "SceneFlowAdaptor",
    "PointMapAdaptor",
    "RayOriginsAdaptor",
    "RayDirectionsAdaptor",
    "RayDirectionsPlusDepthAdaptor",
    "RayDirectionsPlusDepthPlusSceneFlowAdaptor",
    "CamTranslationAdaptor",
    "QuaternionsAdaptor",
    "CamTranslationPlusQuatsAdaptor",
    "RayMapAdaptor",
    "RayMapPlusDepthAdaptor",
    "RayMapPlusDepthPlusQuatsAdaptor",
    "PointMapPlusRayDirectionsPlusDepthAdaptor",
    "ConfidenceAdaptor",
    "Covariance2DAdaptor",
    "MaskAdaptor",
    "ValueWithConfidenceAdaptor",
    "FlowWithConfidenceAdaptor",
    "PointMapWithConfidenceAdaptor",
    "PointMapPlusRayDirectionsPlusDepthWithConfidenceAdaptor",
    "RayDirectionsPlusDepthWithConfidenceAdaptor",
    "RayDirectionsPlusDepthPlusSceneFlowWithConfidenceAdaptor",
    "RayMapPlusDepthWithConfidenceAdaptor",
    "RayMapPlusDepthPlusQuatsWithConfidenceAdaptor",
    "ValueWithMaskAdaptor",
    "PointMapWithMaskAdaptor",
    "PointMapPlusRayDirectionsPlusDepthWithMaskAdaptor",
    "RayDirectionsPlusDepthWithMaskAdaptor",
    "RayDirectionsPlusDepthPlusSceneFlowWithMaskAdaptor",
    "RayMapPlusDepthWithMaskAdaptor",
    "RayMapPlusDepthPlusQuatsWithMaskAdaptor",
    "ValueWithConfidenceAndMaskAdaptor",
    "PointMapWithConfidenceAndMaskAdaptor",
    "PointMapPlusRayDirectionsPlusDepthWithConfidenceAndMaskAdaptor",
    "RayDirectionsPlusDepthWithConfidenceAndMaskAdaptor",
    "RayDirectionsPlusDepthPlusSceneFlowWithConfidenceAndMaskAdaptor",
    "RayMapPlusDepthWithConfidenceAndMaskAdaptor",
    "RayMapPlusDepthPlusQuatsWithConfidenceAndMaskAdaptor",
]

_INF = float("inf")


def _no_bounds(vmin, vmax):
    return (vmin == -_INF) and (vmax == _INF)


def _mode_scale(x, mode):
    "linear/square/exp elementwise scaling (DepthAdaptor semantics, adaptors.py:214-257)."
    if mode == "linear":
        return x
    if mode == "square":
        return x**2
    if mode == "exp":
        return jnp.exp(x)
    raise ValueError(f"Invalid mode: {mode}")


def _mode_scale_radial(x, mode):
    "Scale the distance-to-origin (PointMap/RayOrigins/CamTranslation semantics)."
    if mode == "linear":
        return x
    d = jnp.linalg.norm(x, axis=1, keepdims=True)
    unit = x / jnp.clip(d, 1e-8)
    if mode == "square":
        return unit * jnp.square(d)
    if mode == "exp":
        return unit * jnp.expm1(d)
    raise ValueError(f"Invalid mode: {mode}")


# ---------------------------------------------------------------------------
# Atomic adaptors
# ---------------------------------------------------------------------------


class FlowAdaptor(UniCeptionAdaptorBase):
    "Optical-flow unnormalization (adaptors.py:25-167)."

    def __init__(
        self,
        name: str,
        flow_mean: Union[Tuple[float, float], List[float]],
        flow_std: Union[Tuple[float, float], List[float]],
        base_shape: Tuple[int, int],
        scale_strategy: str,
        output_normalized_coordinate: bool = False,
    ):
        super().__init__(name, required_channels=2)
        # plain python floats, NOT arrays: an ndarray attribute is an nnx
        # data leaf, which eval_shape (serving abstract_construct) would
        # turn into a ShapeDtypeStruct that no checkpoint array fills
        self.flow_mean = tuple(float(v) for v in flow_mean)
        self.flow_std = tuple(float(v) for v in flow_std)
        assert len(self.flow_mean) == 2 and len(self.flow_std) == 2
        self.base_shape = list(base_shape)
        self.scale_strategy = scale_strategy
        self.output_normalized_coordinate = output_normalized_coordinate

    def _get_xy_scale(self, output_shape):
        if self.scale_strategy == "none":
            return 1.0, 1.0
        if self.scale_strategy == "scale_width":
            s = output_shape[1] / self.base_shape[1]
            return s, s
        if self.scale_strategy == "scale_height":
            s = output_shape[0] / self.base_shape[0]
            return s, s
        if self.scale_strategy == "scale_both":
            return output_shape[1] / self.base_shape[1], output_shape[0] / self.base_shape[0]
        raise ValueError(f"Invalid scaling strategy: {self.scale_strategy}")

    def __call__(self, adaptor_input: AdaptorInput):
        x = adaptor_input.adaptor_feature
        assert x.shape[1] == 2, f"FlowAdaptor requires BCHW format with 2 channels, got {x.shape[1]}"
        output_shape = adaptor_input.output_shape_hw

        if not self.output_normalized_coordinate:
            x_scale, y_scale = self._get_xy_scale(output_shape)
            scale = jnp.asarray([x_scale, y_scale], x.dtype).reshape(1, 2, 1, 1)
            mean = jnp.asarray(self.flow_mean, x.dtype).reshape(1, 2, 1, 1) * scale
            std = jnp.asarray(self.flow_std, x.dtype).reshape(1, 2, 1, 1) * scale
            x = x * std + mean
        else:
            H, W = output_shape
            wh = jnp.asarray([W, H], jnp.float32).reshape(1, 2, 1, 1)
            x = 0.5 * (x + 1) * wh + 0.5
            # coordinate bias: center of top-left pixel is (0.5, 0.5)
            xs = jnp.arange(W, dtype=jnp.float32) + 0.5
            ys = jnp.arange(H, dtype=jnp.float32) + 0.5
            coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=0)[None]  # (1, 2, H, W)
            x = x - coords
        return RegressionAdaptorOutput(value=x)


class ScaleAdaptor(UniCeptionAdaptorBase):
    "Scalar scale-factor prediction (adaptors.py:170-211)."

    def __init__(self, name: str, mode: str, vmin: float = 0, vmax: float = _INF):
        super().__init__(name, required_channels=1)
        self.mode, self.vmin, self.vmax = mode, vmin, vmax
        self.no_bounds = _no_bounds(vmin, vmax)

    def __call__(self, adaptor_input: AdaptorInput):
        out = _mode_scale(adaptor_input.adaptor_feature, self.mode)
        if not self.no_bounds:
            out = jnp.clip(out, self.vmin, self.vmax)
        return AdaptorOutput(value=out)


class DepthAdaptor(UniCeptionAdaptorBase):
    "Depth activation (adaptors.py:214-257)."

    def __init__(self, name: str, mode: str, vmin: float = 0, vmax: float = _INF):
        super().__init__(name, required_channels=1)
        self.mode, self.vmin, self.vmax = mode, vmin, vmax
        self.no_bounds = _no_bounds(vmin, vmax)

    def __call__(self, adaptor_input: AdaptorInput):
        out = _mode_scale(adaptor_input.adaptor_feature, self.mode)
        if not self.no_bounds:
            out = jnp.clip(out, self.vmin, self.vmax)
        return RegressionAdaptorOutput(value=out)


class SceneFlowAdaptor(UniCeptionAdaptorBase):
    "Scene-flow activation (adaptors.py:260-296)."

    def __init__(self, name: str, mode: str, vmin: float = -_INF, vmax: float = _INF):
        super().__init__(name, required_channels=3)
        self.mode, self.vmin, self.vmax = mode, vmin, vmax
        self.no_bounds = _no_bounds(vmin, vmax)

    def __call__(self, adaptor_input: AdaptorInput):
        out = _mode_scale(adaptor_input.adaptor_feature, self.mode)
        if not self.no_bounds:
            out = jnp.clip(out, self.vmin, self.vmax)
        return RegressionAdaptorOutput(value=out)


class PointMapAdaptor(UniCeptionAdaptorBase):
    "Pointmap activation with radial/z_exp scaling (adaptors.py:299-355)."

    def __init__(self, name: str, mode: str, vmin: float = -_INF, vmax: float = _INF):
        super().__init__(name, required_channels=3)
        self.mode, self.vmin, self.vmax = mode, vmin, vmax
        self.no_bounds = _no_bounds(vmin, vmax)

    def __call__(self, adaptor_input: AdaptorInput):
        xyz = adaptor_input.adaptor_feature
        if self.mode == "z_exp":
            xy, z = xyz[:, :2], xyz[:, 2:3]
            z = jnp.exp(z)
            out = jnp.concatenate([xy * z, z], axis=1)
        else:
            out = _mode_scale_radial(xyz, self.mode)
        if not self.no_bounds:
            out = jnp.clip(out, self.vmin, self.vmax)
        return RegressionAdaptorOutput(value=out)


class RayOriginsAdaptor(UniCeptionAdaptorBase):
    "Ray-origins activation (adaptors.py:358-406)."

    def __init__(self, name: str, mode: str, vmin: float = -_INF, vmax: float = _INF):
        super().__init__(name, required_channels=3)
        self.mode, self.vmin, self.vmax = mode, vmin, vmax
        self.no_bounds = _no_bounds(vmin, vmax)

    def __call__(self, adaptor_input: AdaptorInput):
        out = _mode_scale_radial(adaptor_input.adaptor_feature, self.mode)
        if not self.no_bounds:
            out = jnp.clip(out, self.vmin, self.vmax)
        return RegressionAdaptorOutput(value=out)


class RayDirectionsAdaptor(UniCeptionAdaptorBase):
    "Ray-directions activation + normalization options (adaptors.py:409-484)."

    def __init__(
        self,
        name: str,
        mode: str,
        normalize_to_unit_sphere: bool,
        normalize_to_unit_image_plane: bool,
        vmin: float = -_INF,
        vmax: float = _INF,
        clamp_min_of_z_dir: bool = False,
        z_dir_min: float = 1,
    ):
        super().__init__(name, required_channels=3)
        self.mode = mode
        self.normalize_to_unit_sphere = normalize_to_unit_sphere
        self.normalize_to_unit_image_plane = normalize_to_unit_image_plane
        self.vmin, self.vmax = vmin, vmax
        self.clamp_min_of_z_dir = clamp_min_of_z_dir
        self.z_dir_min = z_dir_min
        self.no_bounds = _no_bounds(vmin, vmax)

    def __call__(self, adaptor_input: AdaptorInput):
        if self.mode != "linear":
            raise ValueError(f"Invalid mode: {self.mode}")
        out = adaptor_input.adaptor_feature
        if not self.no_bounds:
            out = jnp.clip(out, self.vmin, self.vmax)
        if self.clamp_min_of_z_dir:
            out = jnp.concatenate([out[:, :2], jnp.clip(out[:, 2:3], self.z_dir_min)], axis=1)
        if self.normalize_to_unit_sphere:
            norm = jnp.clip(jnp.linalg.norm(out, axis=1, keepdims=True), 1e-8)
            out = out / norm
        elif self.normalize_to_unit_image_plane:
            out = out / out[:, 2:3]
        return RegressionAdaptorOutput(value=out)


class CamTranslationAdaptor(UniCeptionAdaptorBase):
    "Camera-translation activation (adaptors.py:609-657)."

    def __init__(self, name: str, mode: str, vmin: float = -_INF, vmax: float = _INF):
        super().__init__(name, required_channels=3)
        self.mode, self.vmin, self.vmax = mode, vmin, vmax
        self.no_bounds = _no_bounds(vmin, vmax)

    def __call__(self, adaptor_input: AdaptorInput):
        out = _mode_scale_radial(adaptor_input.adaptor_feature, self.mode)
        if not self.no_bounds:
            out = jnp.clip(out, self.vmin, self.vmax)
        return AdaptorOutput(value=out)


class QuaternionsAdaptor(UniCeptionAdaptorBase):
    "Quaternion (x, y, z, w) activation (adaptors.py:660-708)."

    def __init__(self, name: str, mode: str, normalize: bool, vmin: float = -_INF, vmax: float = _INF):
        super().__init__(name, required_channels=4)
        self.mode, self.normalize = mode, normalize
        self.vmin, self.vmax = vmin, vmax
        self.no_bounds = _no_bounds(vmin, vmax)

    def __call__(self, adaptor_input: AdaptorInput):
        if self.mode != "linear":
            raise ValueError(f"Invalid mode: {self.mode}")
        out = adaptor_input.adaptor_feature
        if not self.no_bounds:
            out = jnp.clip(out, self.vmin, self.vmax)
        if self.normalize:
            norm = jnp.clip(jnp.linalg.norm(out, axis=1, keepdims=True), 1e-8)
            out = out / norm
        return AdaptorOutput(value=out)


class ConfidenceAdaptor(UniCeptionAdaptorBase):
    "Confidence activation: exp / sigmoid / softmax (adaptors.py:1035-1096)."

    def __init__(self, name: str, confidence_type: str, vmin: float, vmax: float):
        super().__init__(name, required_channels=1)
        self.confidence_type = confidence_type
        self.vmin, self.vmax = vmin, vmax
        assert vmin < vmax, "vmin must be less than vmax"
        if confidence_type == "sigmoid":
            assert math.isfinite(vmin) and math.isfinite(vmax), "vmin and vmax must be finite for sigmoid confidence"
            assert vmin >= 0

    def __call__(self, adaptor_input: AdaptorInput):
        x = adaptor_input.adaptor_feature
        if self.confidence_type == "exp":
            conf = self.vmin + jnp.clip(jnp.exp(x), max=self.vmax - self.vmin)
            return RegressionAdaptorOutput(value=conf)
        if self.confidence_type == "sigmoid":
            conf = jax.nn.sigmoid(x) * (self.vmax - self.vmin) + self.vmin
            return RegressionAdaptorOutput(value=conf)
        if self.confidence_type == "softmax":
            B, C, H, W = x.shape
            conf = jnp.reshape(jax.nn.softmax(x.reshape(B, C, -1), axis=-1), (B, C, H, W)) * (H * W)
            return RegressionAdaptorOutput(value=conf)
        raise ValueError(f"Invalid confidence type: {self.confidence_type}")


class Covariance2DAdaptor(UniCeptionAdaptorBase):
    "2D covariance from (c1, c2, s) log-representation (adaptors.py:1099-1166)."

    def __init__(self, name: str, parametrization: str = "exp_tanh", low_confidence_init: bool = False):
        super().__init__(name, required_channels=3)
        self.parametrization = parametrization
        self.low_confidence_init = low_confidence_init

    def __call__(self, adaptor_input: AdaptorInput):
        x = adaptor_input.adaptor_feature
        return self._decode(x, self.parametrization, self.low_confidence_init)

    @staticmethod
    def _decode(x, parametrization, shift_init):
        if parametrization != "exp_tanh":
            raise ValueError(f"Invalid parametrization: {parametrization}")
        c1, c2, s = x[:, 0:1], x[:, 1:2], x[:, 2:3]
        if shift_init:
            c1 = c1 + 8
            c2 = c2 + 8
        diag_exponent = (c1 + c2) / 2
        tanh_s = jnp.tanh(s)
        cov = jnp.concatenate([jnp.exp(c1), jnp.exp(c2), tanh_s * jnp.exp(diag_exponent)], axis=1)
        log_det = c1 + c2 + jnp.log(1 - jnp.square(tanh_s) + 1e-8)
        inv_coeff = 1 / (1 - jnp.square(tanh_s) + 1e-8)
        inv_cov = inv_coeff * jnp.concatenate(
            [jnp.exp(-c1), jnp.exp(-c2), -tanh_s * jnp.exp(-diag_exponent)], axis=1
        )
        return Covariance2DAdaptorOutput(covariance=cov, log_det=log_det, inv_covariance=inv_cov, log_representation=x)

    @classmethod
    def decode(cls, x, representation: str):
        "Standalone decode with the low-confidence shift (adaptors.py:1141-1166)."
        return cls._decode(x, representation, shift_init=True)


class MaskAdaptor(UniCeptionAdaptorBase):
    "Mask logits + sigmoid (adaptors.py:1169-1186)."

    def __init__(self, name: str):
        super().__init__(name, required_channels=1)

    def __call__(self, adaptor_input: AdaptorInput):
        x = adaptor_input.adaptor_feature
        return MaskAdaptorOutput(logits=x, mask=jax.nn.sigmoid(x))


# ---------------------------------------------------------------------------
# Channel-concatenation composites ("Plus" adaptors)
# ---------------------------------------------------------------------------


class _ConcatAdaptor(UniCeptionAdaptorBase):
    "Split channels -> run sub-adaptors -> concat values (the 'Plus' pattern)."

    def __init__(self, name: str, sub_adaptors):
        super().__init__(name, required_channels=sum(a.required_channels for a in sub_adaptors))
        self.sub_adaptors = nnx.List(sub_adaptors)

    def __call__(self, adaptor_input: AdaptorInput):
        feats = adaptor_input.adaptor_feature
        outs, off = [], 0
        for sub in self.sub_adaptors:
            chunk = feats[:, off : off + sub.required_channels]
            off += sub.required_channels
            outs.append(sub(AdaptorInput(adaptor_feature=chunk, output_shape_hw=adaptor_input.output_shape_hw)).value)
        return RegressionAdaptorOutput(value=jnp.concatenate(outs, axis=1))


def _make_ray_directions(name, kw):
    return RayDirectionsAdaptor(
        name,
        kw["ray_directions_mode"],
        kw["ray_directions_normalize_to_unit_sphere"],
        kw["ray_directions_normalize_to_unit_image_plane"],
        kw["ray_directions_vmin"],
        kw["ray_directions_vmax"],
        kw["ray_directions_clamp_min_of_z_dir"],
        kw["ray_directions_z_dir_min"],
    )


class RayDirectionsPlusDepthAdaptor(_ConcatAdaptor):
    "RayDirections(3) + Depth(1) (adaptors.py:485-539)."

    def __init__(self, name: str, **kw):
        subs = [
            _make_ray_directions(name, kw),
            DepthAdaptor(name, kw["depth_mode"], kw["depth_vmin"], kw["depth_vmax"]),
        ]
        super().__init__(name, subs)


class RayDirectionsPlusDepthPlusSceneFlowAdaptor(_ConcatAdaptor):
    "RayDirections(3) + Depth(1) + SceneFlow(3) (adaptors.py:542-606)."

    def __init__(self, name: str, **kw):
        subs = [
            _make_ray_directions(name, kw),
            DepthAdaptor(name, kw["depth_mode"], kw["depth_vmin"], kw["depth_vmax"]),
            SceneFlowAdaptor(name, kw["scene_flow_mode"], kw["scene_flow_vmin"], kw["scene_flow_vmax"]),
        ]
        super().__init__(name, subs)


class CamTranslationPlusQuatsAdaptor(_ConcatAdaptor):
    "CamTranslation(3) + Quaternions(4) (adaptors.py:711-755)."

    def __init__(self, name: str, **kw):
        subs = [
            CamTranslationAdaptor(name, kw["cam_trans_mode"], kw["cam_trans_vmin"], kw["cam_trans_vmax"]),
            QuaternionsAdaptor(
                name,
                kw["quaternions_mode"],
                kw["quaternions_normalize"],
                kw["quaternions_vmin"],
                kw["quaternions_vmax"],
            ),
        ]
        super().__init__(name, subs)

    def __call__(self, adaptor_input: AdaptorInput):
        out = super().__call__(adaptor_input)
        return AdaptorOutput(value=out.value)


class RayMapAdaptor(_ConcatAdaptor):
    "RayOrigins(3) + RayDirections(3) (adaptors.py:758-814)."

    def __init__(self, name: str, **kw):
        subs = [
            RayOriginsAdaptor(name, kw["ray_origins_mode"], kw["ray_origins_vmin"], kw["ray_origins_vmax"]),
            _make_ray_directions(name, kw),
        ]
        super().__init__(name, subs)


class RayMapPlusDepthAdaptor(_ConcatAdaptor):
    "RayOrigins(3) + RayDirections(3) + Depth(1) (adaptors.py:817-880)."

    def __init__(self, name: str, **kw):
        subs = [
            RayOriginsAdaptor(name, kw["ray_origins_mode"], kw["ray_origins_vmin"], kw["ray_origins_vmax"]),
            _make_ray_directions(name, kw),
            DepthAdaptor(name, kw["depth_mode"], kw["depth_vmin"], kw["depth_vmax"]),
        ]
        super().__init__(name, subs)


class RayMapPlusDepthPlusQuatsAdaptor(_ConcatAdaptor):
    "RayOrigins(3) + RayDirections(3) + Depth(1) + Quats(4) (adaptors.py:883-968)."

    def __init__(self, name: str, **kw):
        subs = [
            RayOriginsAdaptor(name, kw["ray_origins_mode"], kw["ray_origins_vmin"], kw["ray_origins_vmax"]),
            _make_ray_directions(name, kw),
            DepthAdaptor(name, kw["depth_mode"], kw["depth_vmin"], kw["depth_vmax"]),
            QuaternionsAdaptor(
                name,
                kw["quaternions_mode"],
                kw["quaternions_normalize"],
                kw["quaternions_vmin"],
                kw["quaternions_vmax"],
            ),
        ]
        super().__init__(name, subs)


class PointMapPlusRayDirectionsPlusDepthAdaptor(_ConcatAdaptor):
    "PointMap(3) + RayDirections(3) + Depth(1) (adaptors.py:971-1032)."

    def __init__(self, name: str, **kw):
        subs = [
            PointMapAdaptor(name, kw["pointmap_mode"], kw["pointmap_vmin"], kw["pointmap_vmax"]),
            _make_ray_directions(name, kw),
            DepthAdaptor(name, kw["depth_mode"], kw["depth_vmin"], kw["depth_vmax"]),
        ]
        super().__init__(name, subs)


# ---------------------------------------------------------------------------
# ValueWith{Confidence, Mask, ConfidenceAndMask} cross-products
# ---------------------------------------------------------------------------


class ValueWithConfidenceAdaptor(UniCeptionAdaptorBase):
    "Value + confidence channel split (adaptors.py:1189-1230)."

    def __init__(self, name: str, value_adaptor, confidence_adaptor):
        super().__init__(name, required_channels=value_adaptor.required_channels + confidence_adaptor.required_channels)
        self.value_adaptor = value_adaptor
        self.confidence_adaptor = confidence_adaptor

    def __call__(self, adaptor_input: AdaptorInput):
        nv = self.value_adaptor.required_channels
        feats = adaptor_input.adaptor_feature
        value_out = self.value_adaptor(AdaptorInput(feats[:, :nv], adaptor_input.output_shape_hw))
        conf_out = self.confidence_adaptor(AdaptorInput(feats[:, nv:], adaptor_input.output_shape_hw))
        return RegressionWithConfidenceAdaptorOutput(value=value_out.value, confidence=conf_out.value)


class ValueWithMaskAdaptor(UniCeptionAdaptorBase):
    "Value + mask channel split (adaptors.py:1592-1633)."

    def __init__(self, name: str, value_adaptor, mask_adaptor):
        super().__init__(name, required_channels=value_adaptor.required_channels + mask_adaptor.required_channels)
        self.value_adaptor = value_adaptor
        self.mask_adaptor = mask_adaptor

    def __call__(self, adaptor_input: AdaptorInput):
        nv = self.value_adaptor.required_channels
        feats = adaptor_input.adaptor_feature
        value_out = self.value_adaptor(AdaptorInput(feats[:, :nv], adaptor_input.output_shape_hw))
        mask_out = self.mask_adaptor(AdaptorInput(feats[:, nv:], adaptor_input.output_shape_hw))
        return RegressionWithMaskAdaptorOutput(value=value_out.value, logits=mask_out.logits, mask=mask_out.mask)


class ValueWithConfidenceAndMaskAdaptor(UniCeptionAdaptorBase):
    "Value + confidence + mask channel split (adaptors.py:1913-1969)."

    def __init__(self, name: str, value_adaptor, confidence_adaptor, mask_adaptor):
        super().__init__(
            name,
            required_channels=value_adaptor.required_channels
            + confidence_adaptor.required_channels
            + mask_adaptor.required_channels,
        )
        self.value_adaptor = value_adaptor
        self.confidence_adaptor = confidence_adaptor
        self.mask_adaptor = mask_adaptor

    def __call__(self, adaptor_input: AdaptorInput):
        nv = self.value_adaptor.required_channels
        nc = self.confidence_adaptor.required_channels
        feats = adaptor_input.adaptor_feature
        value_out = self.value_adaptor(AdaptorInput(feats[:, :nv], adaptor_input.output_shape_hw))
        conf_out = self.confidence_adaptor(AdaptorInput(feats[:, nv : nv + nc], adaptor_input.output_shape_hw))
        mask_out = self.mask_adaptor(AdaptorInput(feats[:, nv + nc :], adaptor_input.output_shape_hw))
        return RegressionWithConfidenceAndMaskAdaptorOutput(
            value=value_out.value, confidence=conf_out.value, logits=mask_out.logits, mask=mask_out.mask
        )


def _confidence_from_kw(name, kw):
    return ConfidenceAdaptor(
        name=f"{name}_confidence",
        confidence_type=kw.pop("confidence_type"),
        vmin=kw.pop("confidence_vmin"),
        vmax=kw.pop("confidence_vmax"),
    )


# --- WithConfidence family (adaptors.py:1233-1592) -------------------------


class FlowWithConfidenceAdaptor(ValueWithConfidenceAdaptor):
    def __init__(self, name: str, flow_mean, flow_std, base_shape, scale_strategy, output_normalized_coordinate,
                 confidence_type, vmin, vmax):
        value = FlowAdaptor(name, flow_mean, flow_std, base_shape, scale_strategy, output_normalized_coordinate)
        conf = ConfidenceAdaptor(f"{name}_confidence", confidence_type, vmin, vmax)
        super().__init__(name, value_adaptor=value, confidence_adaptor=conf)


class PointMapWithConfidenceAdaptor(ValueWithConfidenceAdaptor):
    def __init__(self, name: str, pointmap_mode, pointmap_vmin, pointmap_vmax,
                 confidence_type, confidence_vmin, confidence_vmax):
        value = PointMapAdaptor(name, pointmap_mode, pointmap_vmin, pointmap_vmax)
        conf = ConfidenceAdaptor(f"{name}_confidence", confidence_type, confidence_vmin, confidence_vmax)
        super().__init__(name, value_adaptor=value, confidence_adaptor=conf)


class PointMapPlusRayDirectionsPlusDepthWithConfidenceAdaptor(ValueWithConfidenceAdaptor):
    def __init__(self, name: str, **kw):
        conf = _confidence_from_kw(name, kw)
        super().__init__(name, PointMapPlusRayDirectionsPlusDepthAdaptor(name, **kw), conf)


class RayDirectionsPlusDepthWithConfidenceAdaptor(ValueWithConfidenceAdaptor):
    def __init__(self, name: str, **kw):
        conf = _confidence_from_kw(name, kw)
        super().__init__(name, RayDirectionsPlusDepthAdaptor(name, **kw), conf)


class RayDirectionsPlusDepthPlusSceneFlowWithConfidenceAdaptor(ValueWithConfidenceAdaptor):
    def __init__(self, name: str, **kw):
        conf = _confidence_from_kw(name, kw)
        super().__init__(name, RayDirectionsPlusDepthPlusSceneFlowAdaptor(name, **kw), conf)


class RayMapPlusDepthWithConfidenceAdaptor(ValueWithConfidenceAdaptor):
    def __init__(self, name: str, **kw):
        conf = _confidence_from_kw(name, kw)
        super().__init__(name, RayMapPlusDepthAdaptor(name, **kw), conf)


class RayMapPlusDepthPlusQuatsWithConfidenceAdaptor(ValueWithConfidenceAdaptor):
    def __init__(self, name: str, **kw):
        conf = _confidence_from_kw(name, kw)
        super().__init__(name, RayMapPlusDepthPlusQuatsAdaptor(name, **kw), conf)


# --- WithMask family (adaptors.py:1636-1910) --------------------------------


class PointMapWithMaskAdaptor(ValueWithMaskAdaptor):
    def __init__(self, name: str, pointmap_mode, pointmap_vmin, pointmap_vmax):
        value = PointMapAdaptor(name, pointmap_mode, pointmap_vmin, pointmap_vmax)
        super().__init__(name, value_adaptor=value, mask_adaptor=MaskAdaptor(f"{name}_mask"))


class PointMapPlusRayDirectionsPlusDepthWithMaskAdaptor(ValueWithMaskAdaptor):
    def __init__(self, name: str, **kw):
        super().__init__(name, PointMapPlusRayDirectionsPlusDepthAdaptor(name, **kw), MaskAdaptor(f"{name}_mask"))


class RayDirectionsPlusDepthWithMaskAdaptor(ValueWithMaskAdaptor):
    def __init__(self, name: str, **kw):
        super().__init__(name, RayDirectionsPlusDepthAdaptor(name, **kw), MaskAdaptor(f"{name}_mask"))


class RayDirectionsPlusDepthPlusSceneFlowWithMaskAdaptor(ValueWithMaskAdaptor):
    def __init__(self, name: str, **kw):
        super().__init__(name, RayDirectionsPlusDepthPlusSceneFlowAdaptor(name, **kw), MaskAdaptor(f"{name}_mask"))


class RayMapPlusDepthWithMaskAdaptor(ValueWithMaskAdaptor):
    def __init__(self, name: str, **kw):
        super().__init__(name, RayMapPlusDepthAdaptor(name, **kw), MaskAdaptor(f"{name}_mask"))


class RayMapPlusDepthPlusQuatsWithMaskAdaptor(ValueWithMaskAdaptor):
    def __init__(self, name: str, **kw):
        super().__init__(name, RayMapPlusDepthPlusQuatsAdaptor(name, **kw), MaskAdaptor(f"{name}_mask"))


# --- WithConfidenceAndMask family (adaptors.py:1972-2320) -------------------


class PointMapWithConfidenceAndMaskAdaptor(ValueWithConfidenceAndMaskAdaptor):
    def __init__(self, name: str, pointmap_mode, pointmap_vmin, pointmap_vmax,
                 confidence_type, confidence_vmin, confidence_vmax):
        value = PointMapAdaptor(name, pointmap_mode, pointmap_vmin, pointmap_vmax)
        conf = ConfidenceAdaptor(f"{name}_confidence", confidence_type, confidence_vmin, confidence_vmax)
        super().__init__(name, value, conf, MaskAdaptor(f"{name}_mask"))


class PointMapPlusRayDirectionsPlusDepthWithConfidenceAndMaskAdaptor(ValueWithConfidenceAndMaskAdaptor):
    def __init__(self, name: str, **kw):
        conf = _confidence_from_kw(name, kw)
        super().__init__(name, PointMapPlusRayDirectionsPlusDepthAdaptor(name, **kw), conf, MaskAdaptor(f"{name}_mask"))


class RayDirectionsPlusDepthWithConfidenceAndMaskAdaptor(ValueWithConfidenceAndMaskAdaptor):
    def __init__(self, name: str, **kw):
        conf = _confidence_from_kw(name, kw)
        super().__init__(name, RayDirectionsPlusDepthAdaptor(name, **kw), conf, MaskAdaptor(f"{name}_mask"))


class RayDirectionsPlusDepthPlusSceneFlowWithConfidenceAndMaskAdaptor(ValueWithConfidenceAndMaskAdaptor):
    def __init__(self, name: str, **kw):
        conf = _confidence_from_kw(name, kw)
        super().__init__(name, RayDirectionsPlusDepthPlusSceneFlowAdaptor(name, **kw), conf, MaskAdaptor(f"{name}_mask"))


class RayMapPlusDepthWithConfidenceAndMaskAdaptor(ValueWithConfidenceAndMaskAdaptor):
    def __init__(self, name: str, **kw):
        conf = _confidence_from_kw(name, kw)
        super().__init__(name, RayMapPlusDepthAdaptor(name, **kw), conf, MaskAdaptor(f"{name}_mask"))


class RayMapPlusDepthPlusQuatsWithConfidenceAndMaskAdaptor(ValueWithConfidenceAndMaskAdaptor):
    def __init__(self, name: str, **kw):
        conf = _confidence_from_kw(name, kw)
        super().__init__(name, RayMapPlusDepthPlusQuatsAdaptor(name, **kw), conf, MaskAdaptor(f"{name}_mask"))
