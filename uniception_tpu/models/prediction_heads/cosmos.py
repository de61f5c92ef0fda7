"""
Cosmos tokenizer decoder as a dense prediction head.

Parity with reference uniception/models/prediction_heads/cosmos.py:29-191:
CosmosSingleChannel = post_quant_conv -> CI decoder; CosmosFeature = linear
projection to per-channel 16-dim latents -> one Cosmos decoder per output
channel -> mean over RGB -> learned output scaling/bias.
"""

from typing import Optional

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.libs.cosmos_tokenizer.modules import DecoderType
from uniception_tpu.models.libs.cosmos_tokenizer.networks import TokenizerConfigs
from uniception_tpu.models.prediction_heads.adaptors import (
    Covariance2DAdaptor,
    FlowAdaptor,
    FlowWithConfidenceAdaptor,
    MaskAdaptor,
)
from uniception_tpu.models.prediction_heads.base import PixelTaskOutput, PredictionHeadInput
from uniception_tpu.nn.dpt_parts import Conv2dTorch
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["CosmosSingleChannel", "CosmosFeature", "CLASSNAME_TO_ADAPTOR_CLASS", "COSMOS_LATENT_CHANNELS"]

COSMOS_LATENT_CHANNELS = 16

CLASSNAME_TO_ADAPTOR_CLASS = {
    "FlowAdaptor": FlowAdaptor,
    "FlowWithConfidenceAdaptor": FlowWithConfidenceAdaptor,
    "Covariance2DAdaptor": Covariance2DAdaptor,
    "MaskAdaptor": MaskAdaptor,
}


class CosmosSingleChannel(nnx.Module):
    "Single Cosmos decoder: latent (B, 16, h, w) -> (B, 3, H, W) in ~[-1, 1]."

    def __init__(
        self,
        patch_size: int,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
        **kwargs,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.patch_size = patch_size
        assert patch_size in [8, 16], f"Invalid patch size: {patch_size}"

        tokenizer_config = dict(TokenizerConfigs["CI"].value)
        tokenizer_config.update(dict(spatial_compression=patch_size))
        z_channels = tokenizer_config.pop("z_channels")
        latent_channels = tokenizer_config.pop("latent_channels")
        tokenizer_config.pop("z_factor")

        decoder_name = tokenizer_config.get("decoder", DecoderType.Default.name)
        self.decoder = DecoderType[decoder_name].value(
            z_channels=z_channels, dtype=dtype, param_dtype=param_dtype, rngs=rngs, **tokenizer_config
        )
        self.post_quant_conv = Conv2dTorch(latent_channels, z_channels, 1, 1, 0, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained cosmos decoder from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], strict=False)

    def __call__(self, x):
        x = jnp.transpose(self.post_quant_conv(jnp.transpose(x, (0, 2, 3, 1))), (0, 3, 1, 2))
        return self.decoder(x)


class CosmosFeature(nnx.Module):
    "Multi-channel Cosmos decoder head."

    def __init__(
        self,
        input_feature_dim: int,
        output_dim: int,
        patch_size: int,
        skip_linear: bool = False,
        single_channel_ckpt: Optional[str] = None,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
        **kwargs,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.input_feature_dim = input_feature_dim
        self.output_dim = output_dim
        self.patch_size = patch_size
        self.skip_linear = skip_linear
        assert patch_size in [8, 16], f"Invalid patch size: {patch_size}"

        if not skip_linear:
            self.linear = Conv2dTorch(
                input_feature_dim, output_dim * COSMOS_LATENT_CHANNELS, 1, 1, 0, dtype=dtype, param_dtype=param_dtype, rngs=rngs
            )

        self.cosmos_decoders = nnx.List(
            [
                CosmosSingleChannel(
                    patch_size=patch_size, pretrained_checkpoint_path=single_channel_ckpt,
                    dtype=dtype, param_dtype=param_dtype, rngs=rngs,
                )
                for _ in range(output_dim)
            ]
        )
        self.output_scaling = nnx.Param(jnp.ones((1, output_dim, 1, 1), param_dtype))
        self.output_bias = nnx.Param(jnp.zeros((1, output_dim, 1, 1), param_dtype))

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained cosmos feature head from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], strict=False)

    def __call__(self, feature_input: PredictionHeadInput):
        x = feature_input.last_feature
        assert x.shape[1] == self.input_feature_dim

        if not self.skip_linear:
            x = jnp.transpose(self.linear(jnp.transpose(x, (0, 2, 3, 1))), (0, 3, 1, 2))

        x_split = [
            x[:, i * COSMOS_LATENT_CHANNELS : (i + 1) * COSMOS_LATENT_CHANNELS] for i in range(self.output_dim)
        ]
        outputs = [jnp.mean(dec(xs), axis=1, keepdims=True) for dec, xs in zip(self.cosmos_decoders, x_split)]
        x = jnp.concatenate(outputs, axis=1)
        x = x * self.output_scaling[...].astype(x.dtype) + self.output_bias[...].astype(x.dtype)
        return PixelTaskOutput(decoded_channels=x), x_split
