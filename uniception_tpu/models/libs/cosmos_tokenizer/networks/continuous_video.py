"""
Causal continuous video tokenizer (reference
uniception/models/libs/cosmos_tokenizer/networks/continuous_video.py).
"""

from collections import namedtuple

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.libs.cosmos_tokenizer.modules import ContinuousFormulation, Decoder3DType, Encoder3DType
from uniception_tpu.models.libs.cosmos_tokenizer.modules.layers3d import CausalConv3d

__all__ = ["CausalContinuousVideoTokenizer"]

NetworkEval = namedtuple("NetworkEval", ["reconstructions", "posteriors", "latent"])


class CausalContinuousVideoTokenizer(nnx.Module):
    "Causal video AE/VAE (BASE or FACTORIZED): encoder -> quant conv -> distribution."

    def __init__(self, z_channels: int, z_factor: int, latent_channels: int, *, rngs=None, dtype=None, param_dtype=jnp.float32, **kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.name = kwargs.get("name", "CausalContinuousVideoTokenizer")
        self.latent_channels = latent_channels
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        # variant selection + temporal_compression==4 decoder kludge mirror
        # reference networks/continuous_video.py:32-37
        encoder_name = kwargs.get("encoder", Encoder3DType.BASE.name)
        self.encoder = Encoder3DType[encoder_name].value(z_channels=z_factor * z_channels, **kw, **kwargs)
        if kwargs.get("temporal_compression", 4) == 4:
            kwargs["channels_mult"] = [2, 4]
        decoder_name = kwargs.get("decoder", Decoder3DType.BASE.name)
        self.decoder = Decoder3DType[decoder_name].value(z_channels=z_channels, **kw, **kwargs)

        self.quant_conv = CausalConv3d(z_factor * z_channels, z_factor * latent_channels, kernel_size=1, padding=0, **kw)
        self.post_quant_conv = CausalConv3d(latent_channels, z_channels, kernel_size=1, padding=0, **kw)

        formulation_name = kwargs.get("formulation", ContinuousFormulation.AE.name)
        self.distribution = ContinuousFormulation[formulation_name].value()

    def encode(self, x, rng_key=None):
        h = self.encoder(x)
        moments = self.quant_conv(h)
        return self.distribution(moments, rng_key=rng_key)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng_key=None):
        latent, posteriors = self.encode(x, rng_key=rng_key)
        dec = self.decode(latent)
        return NetworkEval(reconstructions=dec, posteriors=posteriors, latent=latent)
