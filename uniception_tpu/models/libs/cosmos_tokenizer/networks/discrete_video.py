"""
Causal discrete video tokenizer (reference
uniception/models/libs/cosmos_tokenizer/networks/discrete_video.py).
"""

from collections import namedtuple

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.libs.cosmos_tokenizer.modules import Decoder3DType, DiscreteQuantizer, Encoder3DType
from uniception_tpu.models.libs.cosmos_tokenizer.modules.layers3d import CausalConv3d

__all__ = ["CausalDiscreteVideoTokenizer"]

NetworkEval = namedtuple("NetworkEval", ["reconstructions", "quant_loss", "quant_info"])


class CausalDiscreteVideoTokenizer(nnx.Module):
    "Causal video tokenizer (BASE or FACTORIZED) with FSQ/ResFSQ/VQ/LFQ quantization."

    def __init__(self, z_channels: int, embedding_dim: int, z_factor: int = 1, *, rngs=None, dtype=None, param_dtype=jnp.float32, **kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.name = kwargs.get("name", "CausalDiscreteVideoTokenizer")
        self.embedding_dim = embedding_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        # variant selection mirrors reference networks/discrete_video.py:34-38
        encoder_name = kwargs.get("encoder", Encoder3DType.BASE.name)
        self.encoder = Encoder3DType[encoder_name].value(z_channels=z_factor * z_channels, **kw, **kwargs)
        decoder_name = kwargs.get("decoder", Decoder3DType.BASE.name)
        self.decoder = Decoder3DType[decoder_name].value(z_channels=z_channels, **kw, **kwargs)

        self.quant_conv = CausalConv3d(z_factor * z_channels, embedding_dim, kernel_size=1, padding=0, **kw)
        self.post_quant_conv = CausalConv3d(embedding_dim, z_channels, kernel_size=1, padding=0, **kw)

        quantizer_name = kwargs.get("quantizer", DiscreteQuantizer.RESFSQ.name)
        self.quantizer = DiscreteQuantizer[quantizer_name].value(rngs=rngs, **kwargs)

    def encode(self, x):
        "x: (B, C, T, H, W) -> (indices (B, T, H, W), codes, loss)."
        h = self.encoder(x)
        h = self.quant_conv(h)
        return self.quantizer(h)

    def decode(self, indices):
        codes = self.quantizer.indices_to_codes(indices)
        return self.decoder(self.post_quant_conv(codes))

    def __call__(self, x):
        indices, codes, loss = self.encode(x)
        dec = self.decoder(self.post_quant_conv(codes))
        return NetworkEval(reconstructions=dec, quant_loss=loss, quant_info=indices)
