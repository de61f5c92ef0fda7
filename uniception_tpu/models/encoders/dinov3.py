"""
DINOv3 encoders: ViT (RoPE-based) and ConvNeXt.

Behavioral parity with reference uniception/models/encoders/dinov3.py:20-574
at the interface level: same size->dim maps (vits16..vit7b16,
convnext tiny..large), ViTEncoderOutput contract, ConvNeXt's
final_layer_patch_size=32 output grid, IFR variants.

Structural difference: the reference loads the trunk from a *local DINOv3
repo* via torch.hub (dinov3.py:85-98); this implementation ships the
architectures. The ViT trunk follows DINOv3's design (patch-16, cls + 4
storage tokens, axial RoPE on q/k, LayerScale, SwiGLU for the plus/7b
variants); exact RoPE frequency conventions may need adjustment when
converting official weights — flagged in the checkpoint converter.
"""

from typing import Callable, List, Optional, Union

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import UniCeptionViTEncoderBase, ViTEncoderInput, ViTEncoderOutput
from uniception_tpu.models.encoders.vit import DinoVisionTransformer
from uniception_tpu.models.utils.intermediate_feature_return import (
    IntermediateFeatureReturner,
    feature_take_indices,
)
from uniception_tpu.models.utils.positional_encoding import make_patch_positions
from uniception_tpu.nn.blocks import Mlp, SelfAttentionBlock, SwiGLUFFNFused, layer_norm_factory
from uniception_tpu.nn.common import Identity
from uniception_tpu.nn.dpt_parts import Conv2dTorch
from uniception_tpu.ops.rope import Rope2D
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = [
    "DINOv3Encoder",
    "DINOv3IntermediateFeatureReturner",
    "DINOv3ConvNextEncoder",
    "DINOv3ConvNextIntermediateFeatureReturner",
]

_DINOV3_VIT_CONFIGS = {
    "small": dict(embed_dim=384, depth=12, num_heads=6, ffn="mlp"),
    "small+": dict(embed_dim=384, depth=12, num_heads=6, ffn="swiglu"),
    "base": dict(embed_dim=768, depth=12, num_heads=12, ffn="mlp"),
    "large": dict(embed_dim=1024, depth=24, num_heads=16, ffn="mlp"),
    "huge+": dict(embed_dim=1280, depth=32, num_heads=20, ffn="swiglu"),
    "7b": dict(embed_dim=4096, depth=40, num_heads=32, ffn="swiglu"),
}

_CONVNEXT_CONFIGS = {
    "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
}


class _DINOv3ViT(nnx.Module):
    "DINOv3-style ViT trunk: RoPE attention, cls + storage tokens, no patch PE."

    def __init__(self, patch_size, embed_dim, depth, num_heads, ffn, n_storage_tokens=4, *, dtype=None, param_dtype=jnp.float32, rngs):
        norm_layer = layer_norm_factory(eps=1e-5)
        self.embed_dim = embed_dim
        self.depth = depth
        self.patch_size = patch_size
        self.n_storage_tokens = n_storage_tokens
        self.rope = Rope2D(freq=100.0)

        self.patch_embed = nnx.Conv(
            3, embed_dim, kernel_size=(patch_size, patch_size), strides=(patch_size, patch_size), padding="VALID",
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        self.cls_token = nnx.Param(jnp.zeros((1, 1, embed_dim), param_dtype))
        self.storage_tokens = nnx.Param(jnp.zeros((1, n_storage_tokens, embed_dim), param_dtype))

        mlp_layer = Mlp if ffn == "mlp" else SwiGLUFFNFused

        def rope_with_prefix(tokens, pos):
            "Rotate patch tokens only; cls/storage tokens stay unrotated."
            n_prefix = 1 + self.n_storage_tokens
            prefix, patches = tokens[:, :n_prefix], tokens[:, n_prefix:]
            from uniception_tpu.ops.rope import rope_2d

            return jnp.concatenate([prefix, rope_2d(patches, pos)], axis=1)

        self.blocks = nnx.List(
            [
                SelfAttentionBlock(
                    dim=embed_dim, num_heads=num_heads, qkv_bias=True, init_values=1.0,
                    norm_layer=norm_layer, mlp_layer=mlp_layer,
                    custom_positional_encoding=rope_with_prefix,
                    dtype=dtype, param_dtype=param_dtype, rngs=rngs,
                )
                for _ in range(depth)
            ]
        )
        self.norm = norm_layer(embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def forward_tokens(self, image_bchw, n_blocks=None, collect_indices=()):
        B, _, H, W = image_bchw.shape
        hp, wp = H // self.patch_size, W // self.patch_size
        x = self.patch_embed(jnp.transpose(image_bchw, (0, 2, 3, 1))).reshape(B, hp * wp, self.embed_dim)
        prefix = jnp.concatenate(
            [
                jnp.broadcast_to(self.cls_token[...].astype(x.dtype), (B, 1, self.embed_dim)),
                jnp.broadcast_to(self.storage_tokens[...].astype(x.dtype), (B, self.n_storage_tokens, self.embed_dim)),
            ],
            axis=1,
        )
        x = jnp.concatenate([prefix, x], axis=1)
        pos = make_patch_positions(B, hp, wp)

        collected = {}
        n_blocks = n_blocks if n_blocks is not None else len(self.blocks)
        for i, blk in enumerate(self.blocks[:n_blocks]):
            x = blk(x, pos)
            if i in collect_indices:
                collected[i] = x
        return x, collected, (hp, wp)

    def split_tokens(self, x):
        r = self.n_storage_tokens
        return x[:, 0], x[:, 1 : 1 + r], x[:, 1 + r :]

    def forward_features(self, image_bchw):
        x, _, (hp, wp) = self.forward_tokens(image_bchw)
        x = self.norm(x)
        cls_tok, reg_tok, patch_tok = self.split_tokens(x)
        return {
            "x_norm_clstoken": cls_tok,
            "x_norm_regtokens": reg_tok,
            "x_norm_patchtokens": patch_tok,
            "grid_hw": (hp, wp),
        }


class DINOv3Encoder(UniCeptionViTEncoderBase):
    "UniCeption DINOv3 ViT encoder."

    def __init__(
        self,
        name: str,
        dinov3_repo_dir: Optional[str] = None,  # accepted for API parity; unused (self-contained)
        data_norm_type: str = "dinov3",
        patch_size: int = 16,
        size: str = "large",
        weights: Optional[str] = None,
        pretrained_checkpoint_path: Optional[str] = None,
        gradient_checkpointing: bool = False,
        keep_first_n_layers: Optional[int] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
        **_compat_kwargs,
    ):
        super().__init__(name=name, data_norm_type=data_norm_type, patch_size=patch_size, gradient_checkpointing=gradient_checkpointing)
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.version = size
        cfg = _DINOV3_VIT_CONFIGS[size]
        self.enc_embed_dim = cfg["embed_dim"]

        self.model = _DINOv3ViT(
            patch_size, cfg["embed_dim"], cfg["depth"], cfg["num_heads"], cfg["ffn"],
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        if keep_first_n_layers is not None:
            self.model.blocks = nnx.List(list(self.model.blocks)[:keep_first_n_layers])
            self.model.depth = keep_first_n_layers

        for path in (weights, pretrained_checkpoint_path):
            if path:
                print(f"Loading DINOv3 checkpoint from {path}")
                ckpt = load_checkpoint(path)
                load_torch_state_dict(self, ckpt.get("model", ckpt), strict=False)

    def _check_image(self, image):
        assert image.ndim == 4 and image.shape[1] == 3
        _, _, height, width = image.shape
        assert height % self.patch_size == 0 and width % self.patch_size == 0
        return height, width

    def _to_bchw(self, tokens, height, width):
        B = tokens.shape[0]
        hp, wp = height // self.patch_size, width // self.patch_size
        return jnp.transpose(tokens.reshape(B, hp, wp, self.enc_embed_dim), (0, 3, 1, 2))

    def __call__(self, encoder_input: ViTEncoderInput) -> ViTEncoderOutput:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        height, width = self._check_image(encoder_input.image)
        feats = self.model.forward_features(encoder_input.image)["x_norm_patchtokens"]
        return ViTEncoderOutput(features=self._to_bchw(feats, height, width))


class DINOv3IntermediateFeatureReturner(DINOv3Encoder, IntermediateFeatureReturner):
    "DINOv3 ViT encoder with intermediate layers (dinov3.py:157-...)."

    def __init__(self, *args, indices=1, norm_intermediate: bool = True, **kwargs):
        DINOv3Encoder.__init__(self, *args, **kwargs)
        IntermediateFeatureReturner.__init__(self, indices=indices, norm_intermediate=norm_intermediate)

    def __call__(self, encoder_input: ViTEncoderInput) -> List[ViTEncoderOutput]:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        height, width = self._check_image(encoder_input.image)
        take_indices, max_index = feature_take_indices(self.model.depth, self.indices)
        _, collected, _ = self.model.forward_tokens(
            encoder_input.image, n_blocks=max_index + 1, collect_indices=set(take_indices)
        )
        outs = []
        for i in take_indices:
            tokens = collected[i]
            if self.norm_intermediate:
                tokens = self.model.norm(tokens)
            _, _, patch = self.model.split_tokens(tokens)
            outs.append(ViTEncoderOutput(features=self._to_bchw(patch, height, width)))
        return outs


# ---------------------------------------------------------------------------
# ConvNeXt
# ---------------------------------------------------------------------------


class _ConvNextBlock(nnx.Module):
    "ConvNeXt block: dw7x7 -> LN -> pw4x -> GELU -> pw -> gamma. NHWC."

    def __init__(self, dim, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.dwconv = nnx.Conv(
            dim, dim, kernel_size=(7, 7), strides=(1, 1), padding=((3, 3), (3, 3)), feature_group_count=dim,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        self.norm = nnx.LayerNorm(dim, epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.pwconv1 = nnx.Linear(dim, 4 * dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.pwconv2 = nnx.Linear(4 * dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.gamma = nnx.Param(1e-6 * jnp.ones((dim,), param_dtype))

    def __call__(self, x):
        inp = x
        x = self.dwconv(x)
        x = self.norm(x)
        x = self.pwconv1(x)
        x = jax.nn.gelu(x, approximate=False)
        x = self.pwconv2(x)
        return inp + x * self.gamma[...].astype(x.dtype)


class _ConvNext(nnx.Module):
    "ConvNeXt trunk with stage outputs (final stride 32)."

    def __init__(self, depths, dims, *, dtype=None, param_dtype=jnp.float32, rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.dims = dims
        self.downsample_layers = nnx.List([])
        stem = nnx.List([
            nnx.Conv(3, dims[0], kernel_size=(4, 4), strides=(4, 4), padding="VALID", **kw),
            nnx.LayerNorm(dims[0], epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs),
        ])
        self.downsample_layers.append(stem)
        for i in range(3):
            self.downsample_layers.append(
                nnx.List([
                    nnx.LayerNorm(dims[i], epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs),
                    nnx.Conv(dims[i], dims[i + 1], kernel_size=(2, 2), strides=(2, 2), padding="VALID", **kw),
                ])
            )
        self.stages = nnx.List(
            [nnx.List([_ConvNextBlock(dims[i], **kw) for _ in range(depths[i])]) for i in range(4)]
        )
        self.norm = nnx.LayerNorm(dims[-1], epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def stage_outputs(self, image_bchw):
        x = jnp.transpose(image_bchw, (0, 2, 3, 1))
        outs = []
        for i in range(4):
            for layer in self.downsample_layers[i]:
                x = layer(x)
            for blk in self.stages[i]:
                x = blk(x)
            outs.append(x)
        return outs

    def forward_features(self, image_bchw):
        out = self.stage_outputs(image_bchw)[-1]  # (B, H/32, W/32, C)
        B, h, w, C = out.shape
        tokens = self.norm(out.reshape(B, h * w, C))
        return {"x_norm_patchtokens": tokens, "grid_hw": (h, w)}


class DINOv3ConvNextEncoder(UniCeptionViTEncoderBase):
    "UniCeption DINOv3 ConvNeXt encoder (final_layer_patch_size=32 output grid)."

    def __init__(
        self,
        name: str,
        dinov3_repo_dir: Optional[str] = None,
        data_norm_type: str = "dinov3",
        patch_size: int = 16,
        size: str = "large",
        weights: Optional[str] = None,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
        **_compat_kwargs,
    ):
        super().__init__(name=name, data_norm_type=data_norm_type, patch_size=patch_size)
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.version = size
        self.final_layer_patch_size = 32
        self.enc_embed_dim = {"tiny": 768, "small": 768, "base": 1024, "large": 1536}[size]
        cfg = _CONVNEXT_CONFIGS[size]
        self.model = _ConvNext(cfg["depths"], cfg["dims"], dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        for path in (weights, pretrained_checkpoint_path):
            if path:
                print(f"Loading DINOv3 ConvNeXt checkpoint from {path}")
                ckpt = load_checkpoint(path)
                load_torch_state_dict(self, ckpt.get("model", ckpt), strict=False)

    def __call__(self, encoder_input: ViTEncoderInput) -> ViTEncoderOutput:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        image = encoder_input.image
        assert image.ndim == 4 and image.shape[1] == 3
        B, _, height, width = image.shape
        assert height % self.patch_size == 0 and width % self.patch_size == 0

        tokens = self.model.forward_features(image)["x_norm_patchtokens"]
        hp, wp = height // self.final_layer_patch_size, width // self.final_layer_patch_size
        feats = jnp.transpose(tokens.reshape(B, hp, wp, -1), (0, 3, 1, 2))
        return ViTEncoderOutput(features=feats)


class DINOv3ConvNextIntermediateFeatureReturner(DINOv3ConvNextEncoder, IntermediateFeatureReturner):
    "DINOv3 ConvNeXt with per-stage intermediate features (dinov3.py:371-...)."

    def __init__(self, *args, indices=None, norm_intermediate: bool = True, **kwargs):
        DINOv3ConvNextEncoder.__init__(self, *args, **kwargs)
        IntermediateFeatureReturner.__init__(self, indices=indices, norm_intermediate=norm_intermediate)

    def __call__(self, encoder_input: ViTEncoderInput) -> List[ViTEncoderOutput]:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        take_indices, _ = feature_take_indices(4, self.indices)
        outs = self.model.stage_outputs(encoder_input.image)
        return [ViTEncoderOutput(features=jnp.transpose(outs[i], (0, 3, 1, 2))) for i in take_indices]
