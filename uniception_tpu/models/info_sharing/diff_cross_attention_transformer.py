"""
Differential multi-view cross-attention transformer.

Behavioral parity with reference
uniception/models/info_sharing/diff_cross_attention_transformer.py:22-493:
same per-view-branch topology as the cross-attention transformer but with
DiffTransformer attention (lambda-weighted two-softmax difference,
arXiv:2410.05258); blocks receive their depth index for the lambda
schedule (:110-111).
"""

from functools import partial
from typing import Callable, List, Optional, Union

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.info_sharing.cross_attention_transformer import (
    MultiViewCrossAttentionTransformer,
    MultiViewCrossAttentionTransformerIFR,
)
from uniception_tpu.models.utils.intermediate_feature_return import IntermediateFeatureReturner
from uniception_tpu.nn.blocks import DiffCrossAttentionBlock, Mlp, layer_norm_factory
from uniception_tpu.nn.common import Identity, LinearX
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = [
    "DifferentialMultiViewCrossAttentionTransformer",
    "DifferentialMultiViewCrossAttentionTransformerIFR",
]


class DifferentialMultiViewCrossAttentionTransformer(MultiViewCrossAttentionTransformer):
    "Per-view branches of DiffCrossAttentionBlocks (depth-indexed lambdas)."

    def __init__(
        self,
        name: str,
        input_embed_dim: int,
        num_views: int,
        size: Optional[str] = None,
        depth: int = 12,
        dim: int = 768,
        num_heads: int = 12,
        mlp_ratio: float = 4.0,
        qkv_bias: bool = True,
        qk_norm: bool = False,
        proj_drop: float = 0.0,
        attn_drop: float = 0.0,
        init_values: Optional[float] = None,
        drop_path: float = 0.0,
        act_layer: Optional[Callable] = None,
        norm_layer: Optional[Callable] = None,
        mlp_layer=Mlp,
        custom_positional_encoding: Optional[Callable] = None,
        norm_cross_tokens: bool = True,
        pretrained_checkpoint_path: Optional[str] = None,
        gradient_checkpointing: bool = False,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        # construct via the parent with depth=0 blocks, then replace the
        # branches with depth-indexed differential blocks
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        norm_layer = norm_layer or layer_norm_factory(eps=1e-6)

        # Initialize the grandparent (UniCeptionInfoSharingBase) attributes directly
        from uniception_tpu.models.info_sharing.base import UniCeptionInfoSharingBase

        UniCeptionInfoSharingBase.__init__(self, name=name, size=size)

        self.input_embed_dim = input_embed_dim
        self.num_views = num_views
        self.depth = depth
        self.dim = dim
        self.num_heads = num_heads
        self.custom_positional_encoding = custom_positional_encoding
        self.gradient_checkpointing = gradient_checkpointing
        self.pretrained_checkpoint_path = pretrained_checkpoint_path

        if input_embed_dim != dim:
            self.proj_embed = LinearX(input_embed_dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        else:
            self.proj_embed = Identity()

        # the reference halves the head count for the differential blocks
        # (diff_cross_attention_transformer.py:107-113: each diff head uses
        # two sub-heads, so dim/head stays constant)
        assert num_heads % 2 == 0, "Number of heads must be divisible by 2 for differential cross-attention."

        def make_branch():
            return nnx.List(
                [
                    DiffCrossAttentionBlock(
                        dim=dim,
                        depth=i,
                        num_heads=num_heads // 2,
                        mlp_ratio=mlp_ratio,
                        qkv_bias=qkv_bias,
                        qk_norm=qk_norm,
                        proj_drop=proj_drop,
                        attn_drop=attn_drop,
                        init_values=init_values,
                        drop_path=drop_path,
                        norm_layer=norm_layer,
                        mlp_layer=mlp_layer,
                        custom_positional_encoding=custom_positional_encoding,
                        norm_cross_tokens=norm_cross_tokens,
                        dtype=dtype,
                        param_dtype=param_dtype,
                        rngs=rngs,
                    )
                    for i in range(depth)
                ]
            )

        self.multi_view_branches = nnx.List([make_branch() for _ in range(num_views)])
        self.norm = norm_layer(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained differential multi-view cross-attention transformer weights from {pretrained_checkpoint_path} ...")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])


class DifferentialMultiViewCrossAttentionTransformerIFR(
    DifferentialMultiViewCrossAttentionTransformer, IntermediateFeatureReturner
):
    "Differential cross-attention transformer with intermediate returns (:262-...)."

    def __init__(
        self,
        *args,
        indices: Optional[Union[int, List[int]]] = None,
        norm_intermediate: bool = True,
        intermediates_only: bool = False,
        **kwargs,
    ):
        DifferentialMultiViewCrossAttentionTransformer.__init__(self, *args, **kwargs)
        IntermediateFeatureReturner.__init__(
            self, indices=indices, norm_intermediate=norm_intermediate, intermediates_only=intermediates_only
        )

    # reuse the IFR forward from the standard cross-attention transformer
    __call__ = MultiViewCrossAttentionTransformerIFR.__call__
