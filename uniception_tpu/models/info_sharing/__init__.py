"""
Info-sharing registry.

Parity with reference uniception/models/info_sharing/__init__.py:23-37:
INFO_SHARING_CLASSES maps name -> (class, IFR class).
"""

from uniception_tpu.models.info_sharing.base import (
    InfoSharingInput,
    InfoSharingOutput,
    MultiSetTransformerInput,
    MultiSetTransformerOutput,
    MultiViewTransformerInput,
    MultiViewTransformerOutput,
    UniCeptionInfoSharingBase,
)
from uniception_tpu.models.info_sharing.cross_attention_transformer import (
    MultiViewCrossAttentionTransformer,
    MultiViewCrossAttentionTransformerIFR,
)

INFO_SHARING_CLASSES = {
    "cross_attention": (MultiViewCrossAttentionTransformer, MultiViewCrossAttentionTransformerIFR),
}


def _register(name, cls, ifr_cls):
    INFO_SHARING_CLASSES[name] = (cls, ifr_cls)
