"""
Patch Embedder encoder: bare conv patchify + learnable PE + post-PE norm.

Parity with reference uniception/models/encoders/patch_embedder.py:30-181.
"""

from typing import Callable, Optional, Tuple, Union

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import (
    UniCeptionViTEncoderBase,
    ViTEncoderInput,
    ViTEncoderNonImageInput,
    ViTEncoderOutput,
)
from uniception_tpu.models.encoders.pe_utils import interpolate_patch_pos_embed
from uniception_tpu.nn.blocks import layer_norm_factory
from uniception_tpu.nn.common import Identity, trunc_normal
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["PatchEmbedder"]


def _make_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class PatchEmbedder(UniCeptionViTEncoderBase):
    "UniCeption Patch Embedder."

    def __init__(
        self,
        name: str,
        data_norm_type: str = "patch_embedder",
        input_size: Union[int, Tuple[int, int]] = 518,
        patch_size: int = 14,
        in_chans: int = 3,
        enc_embed_dim: int = 1024,
        norm_layer: Optional[Callable] = None,
        post_pe_norm_layer: Optional[Callable] = layer_norm_factory(eps=1e-6),
        interpolate_antialias: bool = False,
        interpolate_offset: float = 0.1,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        super().__init__(name=name, data_norm_type=data_norm_type, patch_size=patch_size)
        rngs = rngs if rngs is not None else nnx.Rngs(0)

        patch_hw = _make_2tuple(patch_size)
        self.input_size = _make_2tuple(input_size)
        self.patches_resolution = (self.input_size[0] // patch_hw[0], self.input_size[1] // patch_hw[1])
        self.num_patches = self.patches_resolution[0] * self.patches_resolution[1]
        self.in_chans = in_chans
        self.enc_embed_dim = enc_embed_dim
        self.interpolate_antialias = interpolate_antialias
        self.interpolate_offset = interpolate_offset

        self.proj = nnx.Conv(
            in_chans, enc_embed_dim, kernel_size=patch_hw, strides=patch_hw, padding="VALID",
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        self.norm = norm_layer(enc_embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if norm_layer else Identity()
        self.pos_embed = nnx.Param(trunc_normal(0.02)(rngs.params(), (1, self.num_patches, enc_embed_dim), param_dtype))
        self.post_pe_norm = (
            post_pe_norm_layer(enc_embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            if post_pe_norm_layer
            else Identity()
        )

        if pretrained_checkpoint_path:
            print(f"Loading custom pretrained Patch Embedder checkpoint from {pretrained_checkpoint_path} ...")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])

    def __call__(self, encoder_input: Union[ViTEncoderInput, ViTEncoderNonImageInput]) -> ViTEncoderOutput:
        if isinstance(encoder_input, ViTEncoderInput):
            self._check_data_normalization_type(encoder_input.data_norm_type)
            input_data = encoder_input.image
        elif isinstance(encoder_input, ViTEncoderNonImageInput):
            input_data = encoder_input.data
        else:
            raise ValueError("Unsupported input type for Patch Embedder.")

        assert input_data.ndim == 4, "Input must be of shape (B, C, H, W)"
        B, _, height, width = input_data.shape
        assert height % self.patch_size == 0 and width % self.patch_size == 0, (
            f"Input shape must be divisible by patch size: {self.patch_size}"
        )
        hp, wp = height // self.patch_size, width // self.patch_size

        x = jnp.transpose(input_data, (0, 2, 3, 1))
        x = self.proj(x).reshape(B, hp * wp, self.enc_embed_dim)
        x = self.norm(x)
        pe = interpolate_patch_pos_embed(
            self.pos_embed[...], hp, wp, self.interpolate_offset, self.interpolate_antialias
        )
        x = x + pe.astype(x.dtype)
        x = self.post_pe_norm(x)

        features = jnp.transpose(x.reshape(B, hp, wp, self.enc_embed_dim), (0, 3, 1, 2))
        return ViTEncoderOutput(features=features)
