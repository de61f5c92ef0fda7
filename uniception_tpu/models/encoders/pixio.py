"""
Pixio encoder: self-contained ViT (H/16 default) with 8 cls tokens and
bicubic PE interpolation.

Behavioral parity with reference uniception/models/encoders/pixio.py:335-581.
The reference downloads weights from the HF hub at construction
(pixio.py:496-503); here weights load from a local converted checkpoint via
``pretrained_checkpoint_path`` (no network access at runtime).
"""

from typing import Optional

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import UniCeptionViTEncoderBase, ViTEncoderInput, ViTEncoderOutput
from uniception_tpu.nn.blocks import SelfAttentionBlock, layer_norm_factory
from uniception_tpu.nn.common import trunc_normal, remat_call
from uniception_tpu.ops.resize import interpolate
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["PixioEncoder", "pixio_vitb16", "pixio_vitl16", "pixio_vith16", "pixio_vit1b16", "pixio_vit5b16"]


class _PixioPatchEmbed(nnx.Module):
    "Conv patchifier; state keys match pixio's patch_embed.proj."

    def __init__(self, img_size, patch_size, in_chans, embed_dim, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.patch_size = (patch_size, patch_size)
        self.num_patches = (img_size // patch_size) ** 2
        self.embed_dim = embed_dim
        self.proj = nnx.Conv(
            in_chans, embed_dim, kernel_size=self.patch_size, strides=self.patch_size, padding="VALID",
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )

    def __call__(self, image_bchw):
        x = jnp.transpose(image_bchw, (0, 2, 3, 1))
        x = self.proj(x)
        B, hp, wp, C = x.shape
        return x.reshape(B, hp * wp, C)


class PixioEncoder(UniCeptionViTEncoderBase):
    "UniCeption Pixio encoder."

    def __init__(
        self,
        name: str = "pixio",
        data_norm_type: str = "pixio",
        img_size: int = 256,
        patch_size: int = 16,
        embed_dim: int = 1280,
        depth: int = 32,
        in_chans: int = 3,
        num_heads: int = 16,
        mlp_ratio: float = 4.0,
        n_cls_tokens: int = 8,
        pretrained_checkpoint_path: Optional[str] = None,
        gradient_checkpointing: bool = False,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
        **_compat_kwargs,  # hf_model_name accepted and ignored (no network)
    ):
        super().__init__(
            name=name, data_norm_type=data_norm_type, patch_size=patch_size,
            gradient_checkpointing=gradient_checkpointing,
        )
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        norm_layer = layer_norm_factory(eps=1e-6)
        self.n_cls_tokens = n_cls_tokens
        self.enc_embed_dim = embed_dim

        self.patch_embed = _PixioPatchEmbed(img_size, patch_size, in_chans, embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.cls_token = nnx.Param(jnp.zeros((1, n_cls_tokens, embed_dim), param_dtype))
        self.pos_embed = nnx.Param(
            trunc_normal(0.02)(rngs.params(), (1, self.patch_embed.num_patches + n_cls_tokens, embed_dim), param_dtype)
        )
        self.blocks = nnx.List(
            [
                SelfAttentionBlock(
                    embed_dim, num_heads, mlp_ratio=mlp_ratio, qkv_bias=True, norm_layer=norm_layer,
                    dtype=dtype, param_dtype=param_dtype, rngs=rngs,
                )
                for _ in range(depth)
            ]
        )
        self.norm = norm_layer(embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained Pixio Encoder from {pretrained_checkpoint_path} ...")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], strict=False)

    def _interpolate_pos_emb(self, hp: int, wp: int):
        "Size-based bicubic PE interpolation (pixio.py:425-456)."
        pe = self.pos_embed[...]
        cls_pe = pe[:, : self.n_cls_tokens]
        patch_pe = pe[:, self.n_cls_tokens :]
        pt = int(patch_pe.shape[1] ** 0.5)
        if pt == hp == wp:
            return pe
        grid = jnp.transpose(patch_pe.reshape(1, pt, pt, -1), (0, 3, 1, 2)).astype(jnp.float32)
        grid = interpolate(grid, size=(hp, wp), mode="bicubic", align_corners=False)
        patch_pe = jnp.transpose(grid, (0, 2, 3, 1)).reshape(1, hp * wp, -1).astype(pe.dtype)
        return jnp.concatenate([cls_pe, patch_pe], axis=1)

    def __call__(self, encoder_input: ViTEncoderInput) -> ViTEncoderOutput:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        image = encoder_input.image
        assert image.ndim == 4 and image.shape[1] == 3
        B, _, height, width = image.shape
        assert height % self.patch_size == 0 and width % self.patch_size == 0
        hp, wp = height // self.patch_size, width // self.patch_size

        pos_embed = self._interpolate_pos_emb(hp, wp)
        x = self.patch_embed(image)
        x = x + pos_embed[:, self.n_cls_tokens :].astype(x.dtype)
        cls_tokens = jnp.broadcast_to(
            (self.cls_token[...] + pos_embed[:, : self.n_cls_tokens]).astype(x.dtype),
            (B, self.n_cls_tokens, self.enc_embed_dim),
        )
        x = jnp.concatenate([cls_tokens, x], axis=1)

        for blk in self.blocks:
            if self.gradient_checkpointing:
                x = remat_call(blk, x)
            else:
                x = blk(x)
        x = self.norm(x)
        features = x[:, self.n_cls_tokens :]
        features = jnp.transpose(features.reshape(B, hp, wp, self.enc_embed_dim), (0, 3, 1, 2))
        return ViTEncoderOutput(features=features)


def _pixio_variant(embed_dim, depth, num_heads):
    def ctor(pretrained=None, **kwargs):
        return PixioEncoder(
            img_size=256, patch_size=16, embed_dim=embed_dim, depth=depth, num_heads=num_heads,
            mlp_ratio=4, n_cls_tokens=8, pretrained_checkpoint_path=pretrained, **kwargs,
        )

    return ctor


pixio_vitb16 = _pixio_variant(768, 12, 12)
pixio_vitl16 = _pixio_variant(1024, 24, 16)
pixio_vith16 = _pixio_variant(1280, 32, 16)
pixio_vit1b16 = _pixio_variant(1536, 48, 24)
pixio_vit5b16 = _pixio_variant(3072, 48, 32)
