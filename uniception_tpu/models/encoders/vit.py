"""
Self-contained DINOv2-style Vision Transformer backbone.

TPU-native replacement for the reference's torch.hub dependency
(reference: uniception/models/encoders/dinov2.py:90-102 loads
facebookresearch/dinov2 at runtime; this library ships the architecture so
no network access or torch is needed at runtime). The architecture follows
DINOv2 (ViT-S/B/L/g, patch 14, cls token, optional register tokens,
bicubic positional-embedding interpolation with the 0.1 offset trick,
LayerScale, exact GELU or SwiGLU-fused FFN).

Checkpoint keys match the hub model's state dict (patch_embed.proj,
cls_token, pos_embed, register_tokens, blocks.N.{norm1,attn.qkv,...,ls1},
norm) so converted DINOv2 weights load directly.
"""

import math
from typing import Optional

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.nn.blocks import Mlp, SelfAttentionBlock, SwiGLUFFNFused, layer_norm_factory
from uniception_tpu.nn.common import trunc_normal
from uniception_tpu.nn.scan import make_stacked_blocks
from uniception_tpu.ops.resize import interpolate

__all__ = ["DinoVisionTransformer", "DINO_VIT_CONFIGS"]

DINO_VIT_CONFIGS = {
    "small": dict(embed_dim=384, depth=12, num_heads=6, ffn_layer="mlp"),
    "base": dict(embed_dim=768, depth=12, num_heads=12, ffn_layer="mlp"),
    "large": dict(embed_dim=1024, depth=24, num_heads=16, ffn_layer="mlp"),
    "giant": dict(embed_dim=1536, depth=40, num_heads=24, ffn_layer="swiglufused"),
}


class _PatchEmbed(nnx.Module):
    "Conv patchifier (NHWC internally); keys match dinov2's patch_embed.proj."

    def __init__(self, patch_size, in_chans, embed_dim, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.patch_size = patch_size
        self.embed_dim = embed_dim
        self.proj = nnx.Conv(
            in_chans,
            embed_dim,
            kernel_size=(patch_size, patch_size),
            strides=(patch_size, patch_size),
            padding="VALID",
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

    def __call__(self, image_bchw):
        x = jnp.transpose(image_bchw, (0, 2, 3, 1))
        x = self.proj(x)
        B, hp, wp, C = x.shape
        return x.reshape(B, hp * wp, C), (hp, wp)


class DinoVisionTransformer(nnx.Module):
    "DINOv2 ViT trunk with cls + register tokens and PE interpolation."

    def __init__(
        self,
        img_size: int = 518,
        patch_size: int = 14,
        in_chans: int = 3,
        embed_dim: int = 1024,
        depth: int = 24,
        num_heads: int = 16,
        mlp_ratio: float = 4.0,
        qkv_bias: bool = True,
        ffn_bias: bool = True,
        proj_bias: bool = True,
        init_values: Optional[float] = 1.0,
        num_register_tokens: int = 0,
        interpolate_offset: float = 0.1,
        interpolate_antialias: bool = False,
        ffn_layer: str = "mlp",
        scan_blocks: bool = False,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        norm_layer = layer_norm_factory(eps=1e-6)
        self.embed_dim = embed_dim
        self.depth = depth
        self.patch_size = patch_size
        self.num_register_tokens = num_register_tokens
        self.interpolate_offset = interpolate_offset
        self.interpolate_antialias = interpolate_antialias

        self.patch_embed = _PatchEmbed(patch_size, in_chans, embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        init02 = trunc_normal(0.02)
        self.cls_token = nnx.Param(jnp.zeros((1, 1, embed_dim), param_dtype))
        num_patches = (img_size // patch_size) ** 2
        self.pos_embed = nnx.Param(init02(rngs.params(), (1, num_patches + 1, embed_dim), param_dtype))
        if num_register_tokens > 0:
            self.register_tokens = nnx.Param(jnp.zeros((1, num_register_tokens, embed_dim), param_dtype))
        else:
            self.register_tokens = None

        mlp_layer = {"mlp": Mlp, "swiglufused": SwiGLUFFNFused}[ffn_layer]

        def make_block(r: nnx.Rngs) -> SelfAttentionBlock:
            return SelfAttentionBlock(
                dim=embed_dim,
                num_heads=num_heads,
                mlp_ratio=mlp_ratio,
                qkv_bias=qkv_bias,
                init_values=init_values,
                norm_layer=norm_layer,
                mlp_layer=mlp_layer,
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=r,
            )

        # scan_blocks: depth-stacked params + lax.scan (trace-once compiles,
        # pipeline-parallel-ready — nn/scan.py); torch checkpoints load into
        # either layout (utils/torch_compat.py stacked key mapping).
        self.scan_blocks = scan_blocks
        if scan_blocks:
            self.blocks = make_stacked_blocks(depth, make_block, rngs)
        else:
            self.blocks = nnx.List([make_block(rngs) for _ in range(depth)])
        self.norm = norm_layer(embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    # --- positional embedding ---------------------------------------------

    def _interpolated_pos_embed(self, hp: int, wp: int, dtype):
        """Bicubic PE interpolation with DINOv2's scale-factor offset trick
        (dinov2 vision_transformer.interpolate_pos_encoding)."""
        from uniception_tpu.models.encoders.pe_utils import interpolate_patch_pos_embed

        pe = self.pos_embed[...].astype(jnp.float32)
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
        patch_pe = interpolate_patch_pos_embed(patch_pe, hp, wp, self.interpolate_offset, self.interpolate_antialias)
        return cls_pe.astype(dtype), patch_pe.astype(dtype)

    # --- forward ------------------------------------------------------------

    def prepare_tokens(self, image_bchw):
        x, (hp, wp) = self.patch_embed(image_bchw)
        B = x.shape[0]
        cls_pe, patch_pe = self._interpolated_pos_embed(hp, wp, x.dtype)
        cls_tok = jnp.broadcast_to(self.cls_token[...].astype(x.dtype), (B, 1, x.shape[-1])) + cls_pe
        x = x + patch_pe
        tokens = [cls_tok]
        if self.register_tokens is not None:
            tokens.append(jnp.broadcast_to(self.register_tokens[...].astype(x.dtype), (B, self.num_register_tokens, x.shape[-1])))
        tokens.append(x)
        return jnp.concatenate(tokens, axis=1), (hp, wp)

    def forward_tokens(self, image_bchw, n_blocks: Optional[int] = None, collect_indices=()):
        "Run the trunk; optionally collect intermediate (pre-norm) token sets."
        x, (hp, wp) = self.prepare_tokens(image_bchw)
        collected = {}
        n_blocks = n_blocks if n_blocks is not None else self.depth
        if self.scan_blocks:
            import jax

            graphdef, state = nnx.split(self.blocks)
            if n_blocks != self.depth:
                state = jax.tree.map(lambda a: a[:n_blocks], state)

            def body(c, block_state):
                out = nnx.merge(graphdef, block_state)(c)
                return out, out

            x, ys = jax.lax.scan(body, x, state)
            collected = {i: ys[i] for i in collect_indices if i < n_blocks}
        else:
            for i, blk in enumerate(self.blocks[:n_blocks]):
                x = blk(x)
                if i in collect_indices:
                    collected[i] = x
        return x, collected, (hp, wp)

    def split_tokens(self, x):
        "tokens -> (cls, registers, patch)."
        r = self.num_register_tokens
        return x[:, 0], x[:, 1 : 1 + r], x[:, 1 + r :]

    def forward_features(self, image_bchw):
        "DINOv2 forward_features dict (x_norm_clstoken / regtokens / patchtokens)."
        x, _, (hp, wp) = self.forward_tokens(image_bchw)
        x = self.norm(x)
        cls_tok, reg_tok, patch_tok = self.split_tokens(x)
        return {
            "x_norm_clstoken": cls_tok,
            "x_norm_regtokens": reg_tok,
            "x_norm_patchtokens": patch_tok,
            "grid_hw": (hp, wp),
        }
