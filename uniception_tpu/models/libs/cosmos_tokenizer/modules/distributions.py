"""
Distributions for continuous tokenizers (reference
uniception/models/libs/cosmos_tokenizer/modules/distributions.py:20-42).
"""

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["IdentityDistribution", "GaussianDistribution"]


class IdentityDistribution:
    "AE formulation: latent passes through."

    def __call__(self, parameters, rng_key=None):
        return parameters, (jnp.zeros((1,)), jnp.zeros((1,)))


class GaussianDistribution:
    "VAE formulation: split (mean, logvar), sample with the given key."

    def __init__(self, min_logvar: float = -30.0, max_logvar: float = 20.0):
        self.min_logvar = min_logvar
        self.max_logvar = max_logvar

    def __call__(self, parameters, rng_key: Optional[jax.Array] = None):
        mean, logvar = jnp.split(parameters, 2, axis=1)
        logvar = jnp.clip(logvar, self.min_logvar, self.max_logvar)
        if rng_key is None:
            sample = mean  # deterministic (inference) mode
        else:
            std = jnp.exp(0.5 * logvar)
            sample = mean + std * jax.random.normal(rng_key, mean.shape, mean.dtype)
        return sample, (mean, logvar)
