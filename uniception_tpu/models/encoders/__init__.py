"""
Encoder registry and factories.

Parity with reference uniception/models/encoders/__init__.py:37-140:
string-keyed ENCODER_CONFIGS registry + plain/IFR factory functions.
Use ``python -m uniception_tpu.models.encoders.list`` to list encoders.
"""

from uniception_tpu.models.encoders.base import (
    EncoderGlobalRepInput,
    EncoderGlobalRepOutput,
    EncoderInput,
    EncoderOutput,
    UniCeptionEncoderBase,
    UniCeptionViTEncoderBase,
    ViTEncoderInput,
    ViTEncoderNonImageInput,
    ViTEncoderOutput,
)
from uniception_tpu.models.encoders.cosmos import CosmosEncoder
from uniception_tpu.models.encoders.croco import CroCoEncoder, CroCoIntermediateFeatureReturner
from uniception_tpu.models.encoders.dense_rep_encoder import DenseRepresentationEncoder
from uniception_tpu.models.encoders.dinov3 import (
    DINOv3ConvNextEncoder,
    DINOv3ConvNextIntermediateFeatureReturner,
    DINOv3Encoder,
    DINOv3IntermediateFeatureReturner,
)
from uniception_tpu.models.encoders.dinov2 import DINOv2Encoder, DINOv2IntermediateFeatureReturner
from uniception_tpu.models.encoders.dune import DUNEEncoder, DUNEIntermediateFeatureReturner
from uniception_tpu.models.encoders.global_rep_encoder import GlobalRepresentationEncoder
from uniception_tpu.models.encoders.image_normalizations import IMAGE_NORMALIZATION_DICT, ImageNormalization
from uniception_tpu.models.encoders.patch_embedder import PatchEmbedder
from uniception_tpu.models.encoders.perception_encoder import (
    PerceptionEncoder,
    PerceptionEncoderIntermediateFeatureReturner,
)
from uniception_tpu.models.encoders.pixio import PixioEncoder
from uniception_tpu.models.encoders.radio import RADIOEncoder, RADIOIntermediateFeatureReturner

ENCODER_CONFIGS = {
    "croco": {
        "class": CroCoEncoder,
        "intermediate_feature_returner_class": CroCoIntermediateFeatureReturner,
        "supported_models": ["CroCov2", "DUSt3R", "MASt3R"],
    },
    "dense_rep_encoder": {
        "class": DenseRepresentationEncoder,
        "supported_models": ["Dense-Representation-Encoder"],
    },
    "dinov2": {
        "class": DINOv2Encoder,
        "intermediate_feature_returner_class": DINOv2IntermediateFeatureReturner,
        "supported_models": ["DINOv2", "DINOv2-Registers", "DINOv2-Depth-Anythingv2"],
    },
    "dinov3": {
        "class": DINOv3Encoder,
        "intermediate_feature_returner_class": DINOv3IntermediateFeatureReturner,
        "supported_models": ["DINOv3-ViT"],
    },
    "dinov3_convnext": {
        "class": DINOv3ConvNextEncoder,
        "intermediate_feature_returner_class": DINOv3ConvNextIntermediateFeatureReturner,
        "supported_models": ["DINOv3-ConvNext"],
    },
    "cosmos": {
        "class": CosmosEncoder,
        "supported_models": ["Cosmos-Tokenizer CI8x8", "Cosmos-Tokenizer CI16x16"],
    },
    "dune": {
        "class": DUNEEncoder,
        "intermediate_feature_returner_class": DUNEIntermediateFeatureReturner,
        "supported_models": ["DUNE"],
    },
    "global_rep_encoder": {
        "class": GlobalRepresentationEncoder,
        "supported_models": ["Global-Representation-Encoder"],
    },
    "perception_encoder": {
        "class": PerceptionEncoder,
        "intermediate_feature_returner_class": PerceptionEncoderIntermediateFeatureReturner,
        "supported_models": ["Perception Encoder Core", "Perception Encoder Spatial"],
    },
    "pixio": {
        "class": PixioEncoder,
        "supported_models": ["Pixio-Encoder"],
    },
    "radio": {
        "class": RADIOEncoder,
        "intermediate_feature_returner_class": RADIOIntermediateFeatureReturner,
        "supported_models": ["RADIO", "E-RADIO (not yet implemented)"],
    },
    "patch_embedder": {
        "class": PatchEmbedder,
        "supported_models": ["Patch-Embedder"],
    },
}


def _register(name, cls, ifr_cls=None, supported=()):
    entry = {"class": cls, "supported_models": list(supported)}
    if ifr_cls is not None:
        entry["intermediate_feature_returner_class"] = ifr_cls
    ENCODER_CONFIGS[name] = entry


def encoder_factory(encoder_str: str, **kwargs) -> UniCeptionEncoderBase:
    """Build an encoder by registry name.

    Use python -m uniception_tpu.models.encoders.list for valid options.
    """
    if encoder_str not in ENCODER_CONFIGS:
        raise ValueError(
            f"Unknown encoder: {encoder_str}. For valid encoder_str options, "
            "please use python -m uniception_tpu.models.encoders.list"
        )
    return ENCODER_CONFIGS[encoder_str]["class"](**kwargs)


def feature_returner_encoder_factory(encoder_str: str, **kwargs) -> UniCeptionEncoderBase:
    "Build an intermediate-feature-returner encoder by registry name."
    if encoder_str not in ENCODER_CONFIGS:
        raise ValueError(
            f"Unknown encoder: {encoder_str}. For valid encoder_str options, "
            "please use python -m uniception_tpu.models.encoders.list"
        )
    cfg = ENCODER_CONFIGS[encoder_str]
    if "intermediate_feature_returner_class" not in cfg:
        raise ValueError(f"Encoder {encoder_str} has no intermediate-feature-returner variant")
    return cfg["intermediate_feature_returner_class"](**kwargs)
