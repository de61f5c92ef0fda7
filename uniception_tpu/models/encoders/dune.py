"""
DUNE encoder: DINOv2-with-registers architecture + custom DUNE weights.

Behavioral parity with reference uniception/models/encoders/dune.py:17-408:
the trunk is the same self-contained DINOv2 ViT (models/encoders/vit.py)
with registers always on and the PE table resized for pe_image_size=448
(dune.py:108-113); the DUNE checkpoint key remap (encoder.* prefix,
blocks.M.N flattening) is reproduced in _extract_and_remap_encoder_weights.
"""

from typing import List, Optional, Union

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import ViTEncoderInput, ViTEncoderOutput
from uniception_tpu.models.encoders.dinov2 import DINOv2Encoder, DINOv2IntermediateFeatureReturner
from uniception_tpu.models.encoders.vit import DINO_VIT_CONFIGS, DinoVisionTransformer
from uniception_tpu.models.utils.intermediate_feature_return import IntermediateFeatureReturner
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["DUNEEncoder", "DUNEIntermediateFeatureReturner"]


def _extract_and_remap_encoder_weights(checkpoint):
    "DUNE ckpt remap (dune.py:172-223): encoder.* -> model.*, flatten blocks.M.N."
    out = {}
    for key, value in checkpoint.items():
        if not key.startswith("encoder."):
            continue
        new_key = key.replace("encoder.", "", 1)
        if "blocks." in new_key:
            parts = new_key.split(".")
            if len(parts) >= 3 and parts[0] == "blocks" and parts[1].isdigit() and parts[2].isdigit():
                parts[1] = parts[2]
                parts.pop(2)
                new_key = ".".join(parts)
        out["model." + new_key] = value
    out.pop("model.mask_token", None)
    return out


class DUNEEncoder(DINOv2Encoder):
    "UniCeption DUNE encoder (DINOv2-reg arch, DUNE weights, 448 PE table)."

    def __init__(
        self,
        name: str,
        pretrained_checkpoint_path: Optional[str] = None,
        data_norm_type: str = "dune",
        patch_size: int = 14,
        vit_size: str = "base",
        pe_image_size: int = 448,
        gradient_checkpointing: bool = False,
        keep_first_n_layers: Optional[int] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
        **_compat_kwargs,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        # build the DINOv2-reg trunk without loading a checkpoint ...
        super().__init__(
            name=name,
            data_norm_type=data_norm_type,
            patch_size=patch_size,
            size=vit_size,
            with_registers=True,
            gradient_checkpointing=gradient_checkpointing,
            keep_first_n_layers=keep_first_n_layers,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        # ... resize the PE table for pe_image_size (dune.py:108-113) ...
        num_patches = (pe_image_size // patch_size) ** 2
        self.model.pos_embed = nnx.Param(jnp.zeros((1, num_patches + 1, self.enc_embed_dim), param_dtype))

        # ... then load the remapped DUNE weights
        if pretrained_checkpoint_path:
            print(f"Loading DUNE pretrained checkpoint from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            state = _extract_and_remap_encoder_weights(ckpt["model"])
            load_torch_state_dict(self, state, strict=False)

    def __call__(self, encoder_input: ViTEncoderInput) -> ViTEncoderOutput:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        height, width = self._check_image(encoder_input.image)
        result = self.model.forward_features(encoder_input.image)
        return ViTEncoderOutput(features=self._patch_to_bchw(result["x_norm_patchtokens"], height, width))


class DUNEIntermediateFeatureReturner(DUNEEncoder, IntermediateFeatureReturner):
    "DUNE encoder returning intermediate layers (dune.py:258-...)."

    def __init__(
        self,
        *args,
        indices: Optional[Union[int, List[int]]] = 1,
        norm_intermediate: bool = True,
        **kwargs,
    ):
        DUNEEncoder.__init__(self, *args, **kwargs)
        IntermediateFeatureReturner.__init__(self, indices=indices, norm_intermediate=norm_intermediate)

    __call__ = DINOv2IntermediateFeatureReturner.__call__
