"""
Info-sharing base classes and typed I/O dataclasses.

Parity with reference uniception/models/info_sharing/base.py:14-117.
Dataclasses are registered pytrees; feature lists keep the reference's
per-view BCHW layout at the API boundary.
"""

from typing import List, Optional

import jax
from flax import nnx, struct

__all__ = [
    "InfoSharingInput",
    "InfoSharingOutput",
    "MultiViewTransformerInput",
    "MultiViewTransformerOutput",
    "MultiSetTransformerInput",
    "MultiSetTransformerOutput",
    "UniCeptionInfoSharingBase",
]


class InfoSharingInput(struct.PyTreeNode):
    pass


class InfoSharingOutput(struct.PyTreeNode):
    pass


class MultiViewTransformerInput(InfoSharingInput):
    """Multi-view transformer input.

    features: per-view (batch, input_embed_dim, feat_h, feat_w).
    additional_input_tokens: (batch, input_embed_dim, num_additional).
    additional_input_tokens_per_view: per-view (batch, input_embed_dim, n).
    positions: optional per-view TRUE token positions (batch, N, 2) for the
        custom positional encoding. The reference regenerates positions from
        the canvas grid (cross_attention_transformer.py:228-233), which is
        wrong for ManyAR portrait samples whose tokens are in transposed-grid
        order; passing the patch embed's own positions here keeps RoPE
        geometry correct per sample (see DUSt3R ``landscape_only``).
    """

    features: List[jax.Array]
    additional_input_tokens: Optional[jax.Array] = None
    additional_input_tokens_per_view: Optional[List[jax.Array]] = None
    positions: Optional[List[jax.Array]] = None


class MultiViewTransformerOutput(InfoSharingOutput):
    "Multi-view transformer output (per-view BCHW features + extra tokens)."

    features: List[jax.Array]
    additional_token_features: Optional[jax.Array] = None
    additional_token_features_per_view: Optional[List[jax.Array]] = None


class MultiSetTransformerInput(InfoSharingInput):
    "Multi-set transformer input: per-set (batch, input_embed_dim, num_tokens)."

    features: List[jax.Array]
    additional_input_tokens: Optional[jax.Array] = None


class MultiSetTransformerOutput(InfoSharingOutput):
    "Multi-set transformer output: per-set (batch, dim, num_tokens)."

    features: List[jax.Array]
    additional_token_features: Optional[jax.Array] = None


class UniCeptionInfoSharingBase(nnx.Module):
    "Info-sharing base class (reference info_sharing/base.py:24-71)."

    def __init__(self, name: str, size: Optional[str] = None):
        self.name = name
        self.size = size

    def __call__(self, model_input: InfoSharingInput) -> InfoSharingOutput:
        raise NotImplementedError
