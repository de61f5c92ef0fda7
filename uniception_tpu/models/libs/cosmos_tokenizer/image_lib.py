"""
Image tokenizer inference library (reference
uniception/models/libs/cosmos_tokenizer/image_lib.py:33-...).

ImageTokenizer wraps a CI/DI tokenizer with numpy-friendly encode/decode/
autoencode over images in [-1, 1] (B, 3, H, W). Models load from converted
checkpoints (the reference loaded torch.jit modules; here the architecture
is native and weights come from the checkpoint bridge).
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import nnx

from uniception_tpu.models.libs.cosmos_tokenizer.networks import TokenizerConfigs, TokenizerModels
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["ImageTokenizer"]


class ImageTokenizer:
    "Continuous or discrete image tokenizer runner."

    def __init__(
        self,
        tokenizer_type: str = "CI",
        spatial_compression: int = 8,
        checkpoint_path: Optional[str] = None,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert tokenizer_type in ("CI", "DI")
        self.tokenizer_type = tokenizer_type
        cfg = dict(TokenizerConfigs[tokenizer_type].value)
        cfg.update(dict(spatial_compression=spatial_compression))
        name = cfg.pop("name", tokenizer_type)
        self.model = TokenizerModels[tokenizer_type].value(rngs=rngs or nnx.Rngs(0), **cfg)
        if checkpoint_path:
            ckpt = load_checkpoint(checkpoint_path)
            load_torch_state_dict(self.model, ckpt.get("model", ckpt), strict=False)

    def encode(self, images):
        "images: (B, 3, H, W) in [-1, 1] -> latent / (indices, codes)."
        x = jnp.asarray(images, jnp.float32)
        if self.tokenizer_type == "CI":
            latent, _ = self.model.encode(x)
            return latent
        indices, codes, _ = self.model.encode(x)
        return indices, codes

    def decode(self, latent_or_indices):
        if self.tokenizer_type == "CI":
            return self.model.decode(jnp.asarray(latent_or_indices))
        return self.model.decode(jnp.asarray(latent_or_indices))

    def autoencode(self, images):
        out = self.model(jnp.asarray(images, jnp.float32))
        return np.asarray(out.reconstructions)
