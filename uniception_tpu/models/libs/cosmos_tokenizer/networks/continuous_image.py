"""
Continuous image tokenizer (reference
uniception/models/libs/cosmos_tokenizer/networks/continuous_image.py:27-110).
"""

from collections import namedtuple

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.libs.cosmos_tokenizer.modules import ContinuousFormulation, DecoderType, EncoderType
from uniception_tpu.nn.dpt_parts import Conv2dTorch

__all__ = ["ContinuousImageTokenizer", "NetworkEval"]

NetworkEval = namedtuple("NetworkEval", ["reconstructions", "posteriors", "latent"])


class ContinuousImageTokenizer(nnx.Module):
    "Encoder -> quant_conv -> distribution; post_quant_conv -> decoder."

    def __init__(self, z_channels: int, z_factor: int, latent_channels: int, *, rngs=None, dtype=None, param_dtype=jnp.float32, **kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.name = kwargs.get("name", "ContinuousImageTokenizer")
        self.latent_channels = latent_channels

        encoder_name = kwargs.get("encoder", EncoderType.Default.name)
        self.encoder = EncoderType[encoder_name].value(
            z_channels=z_factor * z_channels, dtype=dtype, param_dtype=param_dtype, rngs=rngs, **kwargs
        )
        decoder_name = kwargs.get("decoder", DecoderType.Default.name)
        self.decoder = DecoderType[decoder_name].value(
            z_channels=z_channels, dtype=dtype, param_dtype=param_dtype, rngs=rngs, **kwargs
        )

        # 1x1 convs operate NHWC internally but keep BCHW at this API level
        self.quant_conv = Conv2dTorch(z_factor * z_channels, z_factor * latent_channels, 1, 1, 0, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.post_quant_conv = Conv2dTorch(latent_channels, z_channels, 1, 1, 0, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        formulation_name = kwargs.get("formulation", ContinuousFormulation.AE.name)
        self.distribution = ContinuousFormulation[formulation_name].value()

    def _conv_bchw(self, conv, x):
        return jnp.transpose(conv(jnp.transpose(x, (0, 2, 3, 1))), (0, 3, 1, 2))

    def encode(self, x, rng_key=None):
        h = self.encoder(x)
        moments = self._conv_bchw(self.quant_conv, h)
        return self.distribution(moments, rng_key=rng_key)

    def decode(self, z):
        return self.decoder(self._conv_bchw(self.post_quant_conv, z))

    def __call__(self, x, rng_key=None):
        latent, posteriors = self.encode(x, rng_key=rng_key)
        dec = self.decode(latent)
        return NetworkEval(reconstructions=dec, posteriors=posteriors, latent=latent)
