"""
Dense Representation Encoder: PixelUnshuffle patchify -> conv -> residual
blocks -> 1x1 projection (+ optional sinusoid PE, base 70007).

Parity with reference uniception/models/encoders/dense_rep_encoder.py:31-344.
"""

from typing import Callable, List, Optional, Tuple, Union

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import (
    UniCeptionViTEncoderBase,
    ViTEncoderInput,
    ViTEncoderNonImageInput,
    ViTEncoderOutput,
)
from uniception_tpu.models.encoders.pe_utils import interpolate_patch_pos_embed, sinusoid_encoding_table
from uniception_tpu.nn.blocks import layer_norm_factory
from uniception_tpu.nn.common import Identity, gelu_exact
from uniception_tpu.nn.dpt_parts import Conv2dTorch, Seq
from uniception_tpu.ops.pixel_shuffle import pixel_unshuffle
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["DenseRepresentationEncoder", "ResidualBlock"]


def _make_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class ResidualBlock(nnx.Module):
    "Residual conv block (dense_rep_encoder.py:31-52). NHWC."

    def __init__(self, in_channels: int, out_channels: int, act_layer: Callable = gelu_exact, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.conv1 = Conv2dTorch(in_channels, out_channels, 3, 1, 1, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.act = act_layer
        self.conv2 = Conv2dTorch(out_channels, out_channels, 3, 1, 1, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.shortcut = (
            Conv2dTorch(in_channels, out_channels, 1, 1, 0, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            if in_channels != out_channels
            else Identity()
        )

    def __call__(self, x):
        identity = self.shortcut(x)
        out = self.conv1(x)
        out = self.act(out)
        out = self.conv2(out)
        out = out + identity
        return self.act(out)


class DenseRepresentationEncoder(UniCeptionViTEncoderBase):
    "UniCeption Dense Representation Encoder."

    def __init__(
        self,
        name: str,
        in_chans: int = 3,
        enc_embed_dim: int = 1024,
        apply_pe: bool = True,
        input_size_for_pe: Union[int, Tuple[int, int]] = 518,
        patch_size: int = 14,
        intermediate_dims: List[int] = [588, 768, 1024],
        data_norm_type: str = "dense_rep_encoder",
        act_layer: Callable = gelu_exact,
        norm_layer: Optional[Callable] = layer_norm_factory(eps=1e-6),
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

        self.in_chans = in_chans
        self.enc_embed_dim = enc_embed_dim
        self.intermediate_dims = intermediate_dims
        self.apply_pe = apply_pe

        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv_in = Conv2dTorch(in_chans * patch_size**2, intermediate_dims[0], 3, 1, 1, **kw)
        layers = [
            ResidualBlock(intermediate_dims[i], intermediate_dims[i + 1], act_layer, **kw)
            for i in range(len(intermediate_dims) - 1)
        ]
        layers.append(Conv2dTorch(intermediate_dims[-1], enc_embed_dim, 1, 1, 0, **kw))
        self.encoder = Seq(*layers)

        self.norm_layer = norm_layer(enc_embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if norm_layer else Identity()

        if apply_pe:
            patch_hw = _make_2tuple(patch_size)
            self.input_size_for_pe = _make_2tuple(input_size_for_pe)
            self.patches_resolution = (
                self.input_size_for_pe[0] // patch_hw[0],
                self.input_size_for_pe[1] // patch_hw[1],
            )
            self.num_patches = self.patches_resolution[0] * self.patches_resolution[1]
            # sinusoid PE is a deterministic buffer: recomputed, not loaded
            self.pos_embed = jnp.asarray(sinusoid_encoding_table(self.num_patches, enc_embed_dim, 70007.0))
            self.interpolate_antialias = interpolate_antialias
            self.interpolate_offset = interpolate_offset
            self.post_pe_norm = (
                post_pe_norm_layer(enc_embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
                if post_pe_norm_layer
                else Identity()
            )

        if pretrained_checkpoint_path:
            print(f"Loading custom pretrained Dense Representation Encoder checkpoint from {pretrained_checkpoint_path} ...")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            state = {k: v for k, v in ckpt["model"].items() if k != "pos_embed"}
            load_torch_state_dict(self, state)

    def __call__(self, encoder_input: Union[ViTEncoderInput, ViTEncoderNonImageInput]) -> ViTEncoderOutput:
        if isinstance(encoder_input, ViTEncoderInput):
            self._check_data_normalization_type(encoder_input.data_norm_type)
            input_data = encoder_input.image
        elif isinstance(encoder_input, ViTEncoderNonImageInput):
            input_data = encoder_input.data
        else:
            raise ValueError("Unsupported input type for Dense Representation Encoder.")

        assert input_data.ndim == 4, "Input must be of shape (B, C, H, W)"
        assert input_data.shape[1] == self.in_chans, f"Input channels must be {self.in_chans}"
        B, _, height, width = input_data.shape
        assert height % self.patch_size == 0 and width % self.patch_size == 0, (
            f"Input shape must be divisible by patch size: {self.patch_size}"
        )
        hp, wp = height // self.patch_size, width // self.patch_size

        x = pixel_unshuffle(input_data, self.patch_size)  # (B, C*P^2, hp, wp)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = self.conv_in(x)
        x = self.encoder(x)
        x = x.reshape(B, hp * wp, self.enc_embed_dim)
        x = self.norm_layer(x)

        if self.apply_pe:
            pe = interpolate_patch_pos_embed(
                self.pos_embed[None], hp, wp, self.interpolate_offset, self.interpolate_antialias
            )
            x = x + pe.astype(x.dtype)
            x = self.post_pe_norm(x)

        features = jnp.transpose(x.reshape(B, hp, wp, self.enc_embed_dim), (0, 3, 1, 2))
        return ViTEncoderOutput(features=features)
