"""
Cosmos tokenizer network registry (reference
uniception/models/libs/cosmos_tokenizer/networks/__init__.py:28-39).
All four tokenizer families (CI, DI, CV, DV) are available; the video
paths use the FACTORIZED causal encoder/decoder.
"""

from enum import Enum

# alias the config dicts: the submodules continuous_image/discrete_image
# would otherwise shadow the same-named config attributes on this package
from uniception_tpu.models.libs.cosmos_tokenizer.networks.configs import (
    continuous_image as continuous_image_dict,
    continuous_video as continuous_video_dict,
    discrete_image as discrete_image_dict,
    discrete_video as discrete_video_dict,
)
from uniception_tpu.models.libs.cosmos_tokenizer.networks.continuous_image import ContinuousImageTokenizer
from uniception_tpu.models.libs.cosmos_tokenizer.networks.continuous_video import CausalContinuousVideoTokenizer
from uniception_tpu.models.libs.cosmos_tokenizer.networks.discrete_image import DiscreteImageTokenizer
from uniception_tpu.models.libs.cosmos_tokenizer.networks.discrete_video import CausalDiscreteVideoTokenizer


class TokenizerConfigs(Enum):
    CI = continuous_image_dict
    DI = discrete_image_dict
    CV = continuous_video_dict
    DV = discrete_video_dict


class TokenizerModels(Enum):
    CI = ContinuousImageTokenizer
    DI = DiscreteImageTokenizer
    CV = CausalContinuousVideoTokenizer
    DV = CausalDiscreteVideoTokenizer
