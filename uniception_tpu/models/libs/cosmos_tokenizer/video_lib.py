"""
Causal video tokenizer inference library (reference
uniception/models/libs/cosmos_tokenizer/video_lib.py:34-...).

CausalVideoTokenizer wraps CV/DV with encode/decode/autoencode over videos
in [-1, 1] (B, 3, T, H, W), T = 1 + temporal_compression * n.
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import nnx

from uniception_tpu.models.libs.cosmos_tokenizer.networks import TokenizerConfigs, TokenizerModels
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["CausalVideoTokenizer"]


class CausalVideoTokenizer:
    "Continuous or discrete causal video tokenizer runner."

    def __init__(
        self,
        tokenizer_type: str = "CV",
        spatial_compression: int = 8,
        temporal_compression: int = 8,
        checkpoint_path: Optional[str] = None,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert tokenizer_type in ("CV", "DV")
        self.tokenizer_type = tokenizer_type
        cfg = dict(TokenizerConfigs[tokenizer_type].value)
        cfg.update(dict(spatial_compression=spatial_compression, temporal_compression=temporal_compression))
        cfg.pop("name", None)
        self.model = TokenizerModels[tokenizer_type].value(rngs=rngs or nnx.Rngs(0), **cfg)
        if checkpoint_path:
            ckpt = load_checkpoint(checkpoint_path)
            load_torch_state_dict(self.model, ckpt.get("model", ckpt), strict=False)

    def encode(self, video):
        x = jnp.asarray(video, jnp.float32)
        if self.tokenizer_type == "CV":
            latent, _ = self.model.encode(x)
            return latent
        indices, codes, _ = self.model.encode(x)
        return indices, codes

    def decode(self, latent_or_indices):
        return self.model.decode(jnp.asarray(latent_or_indices))

    def autoencode(self, video):
        out = self.model(jnp.asarray(video, jnp.float32))
        return np.asarray(out.reconstructions)
