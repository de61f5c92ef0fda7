"""
NVIDIA RADIO encoder.

Behavioral parity with reference uniception/models/encoders/radio.py:13-367:
same constructor surface (model_version -> embed dim map, keep_first_n_layers,
eradio_input_shape) and ViTEncoderOutput contract (BCHW patch features).

Structural difference: the reference pulls the trunk from torch.hub
(NVlabs/RADIO) at runtime; this implementation ships a self-contained
ViT trunk (timm-style: patch 16, cls + register tokens, no LayerScale)
matching the RADIO ViT variants, loading converted checkpoints. The
E-RADIO variant dispatches to a capability-equivalent hybrid
conv + windowed-attention trunk (encoders/eradio.py); the true NVlabs
architecture lives only in torch.hub, so hub checkpoints cannot be
loaded (network-gated known gap — contract tests only).
"""

from typing import List, Optional, Union

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import UniCeptionViTEncoderBase, ViTEncoderInput, ViTEncoderOutput
from uniception_tpu.models.encoders.eradio import ERadio
from uniception_tpu.models.encoders.vit import DinoVisionTransformer
from uniception_tpu.models.utils.intermediate_feature_return import (
    IntermediateFeatureReturner,
    feature_take_indices,
)
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["RADIOEncoder", "RADIOIntermediateFeatureReturner"]

_RADIO_CONFIGS = {
    # embed_dim, depth, num_heads, num_registers
    "radio_v2.5-b": dict(embed_dim=768, depth=12, num_heads=12),
    "radio_v2.5-l": dict(embed_dim=1024, depth=24, num_heads=16),
    "radio_v2.5-h": dict(embed_dim=1280, depth=32, num_heads=16),
    "radio_v2.5-g": dict(embed_dim=1536, depth=40, num_heads=24),
    "e-radio_v2": dict(embed_dim=1536, depth=0, num_heads=0),
}


class RADIOEncoder(UniCeptionViTEncoderBase):
    "UniCeption RADIO encoder (self-contained ViT trunk)."

    def __init__(
        self,
        name: str,
        data_norm_type: str = "radio",
        patch_size: int = 16,
        model_version: str = "radio_v2.5-l",
        pretrained_checkpoint_path: Optional[str] = None,
        eradio_input_shape: Optional[tuple] = None,
        keep_first_n_layers: Optional[int] = None,
        num_register_tokens: int = 8,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
        **_compat_kwargs,
    ):
        super().__init__(name=name, data_norm_type=data_norm_type, patch_size=patch_size)
        rngs = rngs if rngs is not None else nnx.Rngs(0)

        self.model_version = model_version
        self.enc_embed_dim = _RADIO_CONFIGS[model_version]["embed_dim"]

        if model_version == "radio_v2.5-g":
            assert patch_size == 14, "Patch size must be 14 for RADIO v2.5-g"
        elif "e-radio" not in model_version:
            assert patch_size == 16, "Patch size must be 16 for all other versions of RADIO"

        if "e-radio" in model_version:
            # hybrid conv + windowed-attention trunk; the window size is a
            # static compile constant, so the input shape is required up
            # front exactly like the reference (radio.py:95-98)
            assert eradio_input_shape is not None, "Input shape (height, width) must be provided for E-RADIO models"
            self.model = ERadio(model_version=model_version, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            self.model.set_optimal_window_size(eradio_input_shape)
            self.is_eradio = True
        else:
            self.is_eradio = False
            cfg = _RADIO_CONFIGS[model_version]
            self.model = DinoVisionTransformer(
                img_size=patch_size * 37,  # RADIO CPE trained at 37x37 patch grid
                patch_size=patch_size,
                embed_dim=cfg["embed_dim"],
                depth=cfg["depth"],
                num_heads=cfg["num_heads"],
                init_values=None,  # timm ViT: no LayerScale
                num_register_tokens=num_register_tokens,
                ffn_layer="mlp",
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=rngs,
            )

            if keep_first_n_layers is not None:
                self.model.blocks = nnx.List(list(self.model.blocks)[:keep_first_n_layers])
                self.model.depth = keep_first_n_layers

        if pretrained_checkpoint_path is not None:
            print(f"Loading custom pretrained RADIO checkpoint from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], strict=False)

    def _check_image(self, image):
        assert image.ndim == 4, "Input must be of shape (B, C, H, W)"
        _, channels, height, width = image.shape
        assert channels == 3, "Input must have 3 channels"
        assert height % self.patch_size == 0 and width % self.patch_size == 0
        return height, width

    def _patch_to_bchw(self, patch_tokens, height, width):
        B = patch_tokens.shape[0]
        hp, wp = height // self.patch_size, width // self.patch_size
        return jnp.transpose(patch_tokens.reshape(B, hp, wp, self.enc_embed_dim), (0, 3, 1, 2))

    def __call__(self, encoder_input: ViTEncoderInput) -> ViTEncoderOutput:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        height, width = self._check_image(encoder_input.image)
        if self.is_eradio:
            _, tokens = self.model(encoder_input.image)
            return ViTEncoderOutput(features=self._patch_to_bchw(tokens, height, width))
        result = self.model.forward_features(encoder_input.image)
        return ViTEncoderOutput(features=self._patch_to_bchw(result["x_norm_patchtokens"], height, width))


class RADIOIntermediateFeatureReturner(RADIOEncoder, IntermediateFeatureReturner):
    "RADIO encoder returning intermediate layers (radio.py:140-...)."

    def __init__(
        self,
        *args,
        indices: Optional[Union[int, List[int]]] = 1,
        norm_intermediate: bool = True,
        **kwargs,
    ):
        RADIOEncoder.__init__(self, *args, **kwargs)
        IntermediateFeatureReturner.__init__(self, indices=indices, norm_intermediate=norm_intermediate)

    def __call__(self, encoder_input: ViTEncoderInput) -> List[ViTEncoderOutput]:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        height, width = self._check_image(encoder_input.image)
        take_indices, max_index = feature_take_indices(self.model.depth, self.indices)
        _, collected, _ = self.model.forward_tokens(
            encoder_input.image, n_blocks=max_index + 1, collect_indices=set(take_indices)
        )
        outputs = []
        for i in take_indices:
            tokens = collected[i]
            if self.norm_intermediate:
                tokens = self.model.norm(tokens)
            _, _, patch_tokens = self.model.split_tokens(tokens)
            outputs.append(ViTEncoderOutput(features=self._patch_to_bchw(patch_tokens, height, width)))
        return outputs
