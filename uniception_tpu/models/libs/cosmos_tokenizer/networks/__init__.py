"""
Cosmos tokenizer network registry (reference
uniception/models/libs/cosmos_tokenizer/networks/__init__.py:28-39).
The causal-video tokenizers (CV, DV) are not yet ported to the TPU build
(tracked gap; the 2D image paths are complete).
"""

from enum import Enum

from uniception_tpu.models.libs.cosmos_tokenizer.networks.configs import continuous_image, discrete_image
from uniception_tpu.models.libs.cosmos_tokenizer.networks.continuous_image import ContinuousImageTokenizer
from uniception_tpu.models.libs.cosmos_tokenizer.networks.discrete_image import DiscreteImageTokenizer


class TokenizerConfigs(Enum):
    CI = continuous_image
    DI = discrete_image


class TokenizerModels(Enum):
    CI = ContinuousImageTokenizer
    DI = DiscreteImageTokenizer
