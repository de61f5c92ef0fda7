"""
Meta Perception Encoder wrapper.

Parity with reference uniception/models/encoders/perception_encoder.py:14-237.
The PE ViT is vendored TPU-natively at models/libs/perception_encoder/pe.py;
weights load from converted checkpoints via ``pe_checkpoint_path`` (the
reference downloads from the HF hub inside from_config).
"""

from typing import List, Optional, Union

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import UniCeptionViTEncoderBase, ViTEncoderInput, ViTEncoderOutput
from uniception_tpu.models.libs.perception_encoder.pe import PE_VISION_CONFIG, VisionTransformer
from uniception_tpu.models.utils.intermediate_feature_return import IntermediateFeatureReturner
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["PerceptionEncoder", "PerceptionEncoderIntermediateFeatureReturner"]

_MODEL_CKPT_DICT = {
    ("core", "base"): "PE-Core-B16-224",
    ("core", "large"): "PE-Core-L14-336",
    ("core", "giant"): "PE-Core-G14-448",
    ("lang", "base"): "PE-Lang-B16-224",
    ("lang", "large"): "PE-Lang-L14-448",
    ("lang", "giant"): "PE-Lang-G14-448",
    ("spatial", "giant"): "PE-Spatial-G14-448",
}


class PerceptionEncoder(UniCeptionViTEncoderBase):
    "UniCeption Perception Encoder."

    def __init__(
        self,
        name: str,
        data_norm_type: str = "perception_encoder",
        patch_size: int = 14,
        size: str = "large",
        checkpoint_type: str = "core",
        pretrained_checkpoint_path: Optional[str] = None,
        pe_checkpoint_path: Optional[str] = None,
        gradient_checkpointing: bool = False,
        keep_first_n_layers: Optional[int] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
        **_compat_kwargs,
    ):
        super().__init__(
            name=name, data_norm_type=data_norm_type, size=size, patch_size=patch_size,
            gradient_checkpointing=gradient_checkpointing,
        )
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.enc_embed_dim = {"small": 384, "base": 768, "large": 1024, "giant": 1536}[size]

        model_str = _MODEL_CKPT_DICT.get((checkpoint_type, size))
        if model_str is None:
            raise ValueError(f"Unsupported combination of checkpoint_type '{checkpoint_type}' and size '{size}'.")

        self.model = VisionTransformer.from_config(
            model_str, pretrained=pe_checkpoint_path is not None, checkpoint_path=pe_checkpoint_path, rngs=rngs,
            param_dtype=param_dtype,
        )

        if keep_first_n_layers is not None:
            self.model.truncate(keep_first_n_layers)

        if pretrained_checkpoint_path:
            print(f"Loading custom pretrained Perception Encoder checkpoint from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], strict=False)

    def _check_image(self, image):
        assert image.ndim == 4 and image.shape[1] == 3, "Input must be (B, 3, H, W)"
        _, _, height, width = image.shape
        assert height % self.patch_size == 0 and width % self.patch_size == 0
        return height, width

    def _to_bchw(self, tokens, height, width):
        B = tokens.shape[0]
        hp, wp = height // self.patch_size, width // self.patch_size
        return jnp.transpose(tokens.reshape(B, hp, wp, -1), (0, 3, 1, 2))

    def __call__(self, encoder_input: ViTEncoderInput) -> ViTEncoderOutput:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        height, width = self._check_image(encoder_input.image)
        feats = self.model.forward_features(encoder_input.image, norm=True, strip_cls_token=True)
        return ViTEncoderOutput(features=self._to_bchw(feats, height, width))


class PerceptionEncoderIntermediateFeatureReturner(PerceptionEncoder, IntermediateFeatureReturner):
    "PE encoder returning intermediate layers (perception_encoder.py:126-...)."

    def __init__(
        self,
        *args,
        indices: Optional[Union[int, List[int]]] = 1,
        norm_intermediate: bool = True,
        **kwargs,
    ):
        PerceptionEncoder.__init__(self, *args, **kwargs)
        IntermediateFeatureReturner.__init__(self, indices=indices, norm_intermediate=norm_intermediate)

    def __call__(self, encoder_input: ViTEncoderInput) -> List[ViTEncoderOutput]:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        height, width = self._check_image(encoder_input.image)
        n = self.indices if self.indices is not None else self.model.layers
        outs = self.model.get_intermediate_layers(
            encoder_input.image, n=n, norm=self.norm_intermediate, strip_cls_token=True
        )
        return [ViTEncoderOutput(features=self._to_bchw(o, height, width)) for o in outs]
