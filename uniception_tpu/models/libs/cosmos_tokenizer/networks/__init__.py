"""
Cosmos tokenizer network registry (reference
uniception/models/libs/cosmos_tokenizer/networks/__init__.py:28-39).
The causal-video tokenizers (CV, DV) are not yet ported to the TPU build
(tracked gap; the 2D image paths are complete).
"""

from enum import Enum

# alias the config dicts: the submodules continuous_image/discrete_image
# would otherwise shadow the same-named config attributes on this package
from uniception_tpu.models.libs.cosmos_tokenizer.networks.configs import (
    continuous_image as continuous_image_dict,
    discrete_image as discrete_image_dict,
)
from uniception_tpu.models.libs.cosmos_tokenizer.networks.continuous_image import ContinuousImageTokenizer
from uniception_tpu.models.libs.cosmos_tokenizer.networks.discrete_image import DiscreteImageTokenizer


class TokenizerConfigs(Enum):
    CI = continuous_image_dict
    DI = discrete_image_dict


class TokenizerModels(Enum):
    CI = ContinuousImageTokenizer
    DI = DiscreteImageTokenizer
