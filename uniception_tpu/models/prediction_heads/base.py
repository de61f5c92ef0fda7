"""
Prediction-head base classes, typed I/O dataclasses and AdaptorMap.

Parity with reference uniception/models/prediction_heads/base.py:14-211.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx, struct

__all__ = [
    "PredictionHeadInput",
    "PredictionHeadLayeredInput",
    "PredictionHeadTokenInput",
    "PixelTaskOutput",
    "SummaryTaskOutput",
    "AdaptorInput",
    "AdaptorOutput",
    "PredictionHeadOutput",
    "MaskAdaptorOutput",
    "Covariance2DAdaptorOutput",
    "RegressionAdaptorOutput",
    "RegressionWithConfidenceAdaptorOutput",
    "RegressionWithMaskAdaptorOutput",
    "RegressionWithConfidenceAndMaskAdaptorOutput",
    "UniCeptionPredictionHeadBase",
    "UniCeptionAdaptorBase",
    "AdaptorMap",
]


class PredictionHeadInput(struct.PyTreeNode):
    "Dense head input: (batch, feat_dim, feat_h, feat_w)."

    last_feature: jax.Array


class PredictionHeadLayeredInput(struct.PyTreeNode):
    "Layered head input (DPT): list of BCHW features + target (H, W)."

    list_features: List[jax.Array]
    target_output_shape: Tuple[int, int] = struct.field(pytree_node=False)


class PredictionHeadTokenInput(struct.PyTreeNode):
    "Token head input: (batch, feat_dim, num_tokens)."

    last_feature: jax.Array


class PixelTaskOutput(struct.PyTreeNode):
    "Dense pixel-wise output (BCHW at input resolution)."

    decoded_channels: jax.Array


class SummaryTaskOutput(struct.PyTreeNode):
    "Per-image latent output (BC)."

    decoded_channels: jax.Array


class AdaptorInput(struct.PyTreeNode):
    adaptor_feature: jax.Array
    output_shape_hw: Tuple[int, int] = struct.field(pytree_node=False)


class AdaptorOutput(struct.PyTreeNode):
    value: jax.Array


class PredictionHeadOutput(struct.PyTreeNode):
    adaptor_output: Dict[str, AdaptorOutput]


class MaskAdaptorOutput(struct.PyTreeNode):
    logits: jax.Array
    mask: jax.Array


class Covariance2DAdaptorOutput(struct.PyTreeNode):
    covariance: jax.Array          # (B, 3, H, W): s_x^2, s_y^2, rho_xy
    log_det: jax.Array             # (B, 1, H, W)
    inv_covariance: jax.Array      # (B, 3, H, W): [0,0], [1,1], [0,1]
    log_representation: jax.Array  # (B, 3, H, W): c1, c2, s


class RegressionAdaptorOutput(struct.PyTreeNode):
    value: jax.Array


class RegressionWithConfidenceAdaptorOutput(struct.PyTreeNode):
    value: jax.Array
    confidence: jax.Array


class RegressionWithMaskAdaptorOutput(struct.PyTreeNode):
    value: jax.Array
    logits: jax.Array
    mask: jax.Array


class RegressionWithConfidenceAndMaskAdaptorOutput(struct.PyTreeNode):
    value: jax.Array
    confidence: jax.Array
    logits: jax.Array
    mask: jax.Array


class UniCeptionPredictionHeadBase(nnx.Module):
    "Prediction-head base (reference base.py:107-136)."

    def __init__(self, name: str):
        self.name = name

    def __call__(self, head_input: PredictionHeadInput) -> PredictionHeadOutput:
        raise NotImplementedError


class UniCeptionAdaptorBase(nnx.Module):
    "Adaptor base (reference base.py:139-170)."

    def __init__(self, name: str, required_channels: int):
        self.name = name
        self.required_channels = required_channels

    def __call__(self, adaptor_input: AdaptorInput) -> AdaptorOutput:
        raise NotImplementedError


class AdaptorMap(nnx.Module):
    """Slices decoded channels and dispatches to named adaptors
    (reference base.py:173-211)."""

    def __init__(self, *adaptors: UniCeptionAdaptorBase):
        self.adaptors = nnx.Dict({adaptor.name: adaptor for adaptor in adaptors})
        self.adaptor_order = [adaptor.name for adaptor in adaptors]
        self.required_channels = sum(adaptor.required_channels for adaptor in adaptors)

    def __call__(self, adaptor_input) -> Dict[str, AdaptorOutput]:
        # the reference map reads `.decoded_channels` off head outputs
        # (base.py:203); accept either that or an AdaptorInput
        feats = getattr(adaptor_input, "adaptor_feature", None)
        if feats is None:
            feats = adaptor_input.decoded_channels
        sizes = [self.adaptors[name].required_channels for name in self.adaptor_order]
        offsets = [0]
        for s in sizes:
            offsets.append(offsets[-1] + s)
        result = {}
        for i, name in enumerate(self.adaptor_order):
            chunk = feats[:, offsets[i]:offsets[i + 1]]
            result[name] = self.adaptors[name](
                AdaptorInput(adaptor_feature=chunk, output_shape_hw=tuple(chunk.shape[2:]))
            )
        return result
