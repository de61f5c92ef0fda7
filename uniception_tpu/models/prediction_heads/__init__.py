"""
Prediction heads + adaptors namespace (mirrors the reference package API:
dataclasses and bases are importable from the package root, reference
uniception/models/prediction_heads/__init__.py).
"""

from uniception_tpu.models.prediction_heads.adaptors import *  # noqa: F401,F403
from uniception_tpu.models.prediction_heads.base import (
    AdaptorInput,
    AdaptorMap,
    AdaptorOutput,
    Covariance2DAdaptorOutput,
    MaskAdaptorOutput,
    PixelTaskOutput,
    PredictionHeadInput,
    PredictionHeadLayeredInput,
    PredictionHeadOutput,
    PredictionHeadTokenInput,
    RegressionAdaptorOutput,
    RegressionWithConfidenceAdaptorOutput,
    RegressionWithConfidenceAndMaskAdaptorOutput,
    RegressionWithMaskAdaptorOutput,
    SummaryTaskOutput,
    UniCeptionAdaptorBase,
    UniCeptionPredictionHeadBase,
)
from uniception_tpu.models.prediction_heads.dpt import (
    DPTFeature,
    DPTFeatureDoubleUpsampling,
    DPTRegressionProcessor,
    DPTSegmentationProcessor,
)
from uniception_tpu.models.prediction_heads.global_head import GlobalHead
from uniception_tpu.models.prediction_heads.linear import LinearFeature
from uniception_tpu.models.prediction_heads.mlp_feature import MLPFeature
from uniception_tpu.models.prediction_heads.mlp_head import MLPHead
from uniception_tpu.models.prediction_heads.pose_head import PoseHead
