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
        "supported_models": ["RADIO", "E-RADIO (capability-equivalent hybrid trunk; hub checkpoints not loadable offline)"],
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


def get_available_encoders():
    "Registry keys (reference encoders/__init__.py get_available_encoders)."
    return sorted(ENCODER_CONFIGS)


def print_available_encoder_models():
    for name in get_available_encoders():
        print(name)


def _make_encoder_test(encoder_str: str, **kwargs) -> UniCeptionEncoderBase:
    """Build the canonical test configuration for an encoder string
    (reference encoders/__init__.py:162-294), including the canonical
    checkpoint path under checkpoints/encoders relative to the repo.

    Checkpoints are only passed through when the file exists, so the same
    configurations are constructible offline (random init) and, when the
    checkpoint tree is populated, load the published weights.
    """
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    ckpt_dir = os.path.normpath(os.path.join(here, "../../../checkpoints/encoders"))

    def ckpt(rel):
        path = os.path.join(ckpt_dir, rel)
        return path if os.path.exists(path) else None

    if encoder_str == "dummy":
        return UniCeptionEncoderBase(name="dummy", data_norm_type="dummy")
    if encoder_str == "croco":
        return CroCoEncoder(name="croco", data_norm_type="croco", patch_embed_cls="PatchEmbedCroCo",
                            pretrained_checkpoint_path=ckpt("CroCo_Encoder_224.pth"), **kwargs)
    if encoder_str == "dust3r_224":
        return CroCoEncoder(name="dust3r_224", data_norm_type="dust3r", patch_embed_cls="PatchEmbedDust3R",
                            pretrained_checkpoint_path=ckpt("CroCo_Encoder_224_DUSt3R_linear.pth"), **kwargs)
    if encoder_str in ("dust3r_512", "dust3r_512_dpt", "mast3r_512"):
        names = {
            "dust3r_512": "CroCo_Encoder_512_DUSt3R_linear.pth",
            "dust3r_512_dpt": "CroCo_Encoder_512_DUSt3R_dpt.pth",
            "mast3r_512": "CroCo_Encoder_512_MASt3R.pth",
        }
        return CroCoEncoder(name=encoder_str, data_norm_type="dust3r", patch_embed_cls="ManyAR_PatchEmbed",
                            img_size=(512, 512), pretrained_checkpoint_path=ckpt(names[encoder_str]), **kwargs)
    if "dinov2" in encoder_str:
        size = encoder_str.split("_")[1]
        with_registers = "reg" in encoder_str
        path = None
        if "dav2" in encoder_str:
            path = ckpt(f"DINOv2_ViT{size[0].upper()}_DepthAnythingV2.pth")
        return DINOv2Encoder(name=encoder_str.replace("_reg", ""), size=size, with_registers=with_registers,
                             pretrained_checkpoint_path=path, **kwargs)
    if "radio" in encoder_str:
        eradio_input_shape = (224, 224) if "e-radio" in encoder_str else None
        return RADIOEncoder(name=encoder_str, model_version=encoder_str, eradio_input_shape=eradio_input_shape, **kwargs)
    if "dinov3_convnext" in encoder_str:
        return DINOv3ConvNextEncoder(name=encoder_str, size=encoder_str.split("_")[-1],
                                     weights=ckpt("dinov3_convnext_base_pretrain_lvd1689m-801f2ba9.pth"), **kwargs)
    if "dinov3" in encoder_str:
        return DINOv3Encoder(name=encoder_str, size=encoder_str.split("_")[-1],
                             weights=ckpt("dinov3_vitb16_pretrain_lvd1689m-73cec8be.pth"), **kwargs)
    if "dune" in encoder_str:
        return DUNEEncoder(name="dune_base", vit_size="base", pe_image_size=448,
                           pretrained_checkpoint_path=ckpt("dune_vitbase14_448.pth"), **kwargs)
    if "cosmos" in encoder_str:
        patch_size = int(encoder_str.split("x")[-1])
        return CosmosEncoder(name=encoder_str, patch_size=patch_size,
                             pretrained_checkpoint_path=ckpt(f"Cosmos-Tokenizer-CI{patch_size}x{patch_size}/encoder.pth"),
                             **kwargs)
    if "perception_encoder" in encoder_str:
        pe_type, pe_size = encoder_str.split("_")[2], encoder_str.split("_")[3]
        return PerceptionEncoder(name=encoder_str, patch_size=16 if pe_size == "base" else 14,
                                 data_norm_type="perception_encoder", size=pe_size, checkpoint_type=pe_type)
    if "patch_embedder" in encoder_str:
        return PatchEmbedder(name=encoder_str, **kwargs)
    if "pixio" in encoder_str:
        return PixioEncoder(name=encoder_str, patch_size=16, data_norm_type="pixio")
    raise ValueError(f"Unknown encoder: {encoder_str}")
