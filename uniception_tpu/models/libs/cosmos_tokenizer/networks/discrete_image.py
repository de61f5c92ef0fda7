"""
Discrete image tokenizer (reference
uniception/models/libs/cosmos_tokenizer/networks/discrete_image.py:27-130).
"""

from collections import namedtuple

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.libs.cosmos_tokenizer.modules import DecoderType, DiscreteQuantizer, EncoderType
from uniception_tpu.nn.dpt_parts import Conv2dTorch

__all__ = ["DiscreteImageTokenizer", "NetworkEval"]

NetworkEval = namedtuple("NetworkEval", ["reconstructions", "quant_loss", "quant_info"])


class DiscreteImageTokenizer(nnx.Module):
    "Encoder -> quant_conv -> quantizer; inverse -> post_quant_conv -> decoder."

    def __init__(self, z_channels: int, embedding_dim: int, *, rngs=None, dtype=None, param_dtype=jnp.float32, **kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.name = kwargs.get("name", "DiscreteImageTokenizer")
        self.embedding_dim = embedding_dim

        encoder_name = kwargs.get("encoder", EncoderType.Default.name)
        self.encoder = EncoderType[encoder_name].value(z_channels=z_channels, dtype=dtype, param_dtype=param_dtype, rngs=rngs, **kwargs)
        decoder_name = kwargs.get("decoder", DecoderType.Default.name)
        self.decoder = DecoderType[decoder_name].value(z_channels=z_channels, dtype=dtype, param_dtype=param_dtype, rngs=rngs, **kwargs)

        self.quant_conv = Conv2dTorch(z_channels, embedding_dim, 1, 1, 0, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.post_quant_conv = Conv2dTorch(embedding_dim, z_channels, 1, 1, 0, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        quantizer_name = kwargs.get("quantizer", DiscreteQuantizer.RESFSQ.name)
        if quantizer_name == DiscreteQuantizer.VQ.name:
            assert "num_embeddings" in kwargs
            kwargs.update(dict(embedding_dim=embedding_dim))
        elif quantizer_name == DiscreteQuantizer.LFQ.name:
            assert "codebook_size" in kwargs and "codebook_dim" in kwargs
        elif quantizer_name in (DiscreteQuantizer.FSQ.name, DiscreteQuantizer.RESFSQ.name):
            assert "levels" in kwargs
        self.quantizer = DiscreteQuantizer[quantizer_name].value(rngs=rngs, **kwargs)

    def _conv_bchw(self, conv, x):
        return jnp.transpose(conv(jnp.transpose(x, (0, 2, 3, 1))), (0, 3, 1, 2))

    def encode(self, x):
        h = self.encoder(x)
        h = self._conv_bchw(self.quant_conv, h)
        return self.quantizer(h)

    def decode(self, indices):
        codes = self.quantizer.indices_to_codes(indices)
        return self.decoder(self._conv_bchw(self.post_quant_conv, codes))

    def __call__(self, x):
        indices, codes, loss = self.encode(x)
        dec = self.decoder(self._conv_bchw(self.post_quant_conv, codes))
        return NetworkEval(reconstructions=dec, quant_loss=loss, quant_info=indices)
