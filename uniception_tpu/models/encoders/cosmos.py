"""
Cosmos continuous-image tokenizer encoder as a dense feature encoder.

Parity with reference uniception/models/encoders/cosmos.py:12-110: the CI
config with spatial_compression = patch_size (8 or 16); encode =
encoder -> quant_conv -> distribution (16-ch latent).
"""

from typing import Optional

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import UniCeptionViTEncoderBase, ViTEncoderInput, ViTEncoderOutput
from uniception_tpu.models.libs.cosmos_tokenizer.modules import ContinuousFormulation, EncoderType
from uniception_tpu.models.libs.cosmos_tokenizer.networks import TokenizerConfigs
from uniception_tpu.nn.dpt_parts import Conv2dTorch
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["CosmosEncoder"]


class CosmosEncoder(UniCeptionViTEncoderBase):
    "UniCeption Cosmos encoder."

    def __init__(
        self,
        name: str,
        data_norm_type: str = "cosmos",
        patch_size: int = 8,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
        **kwargs,
    ):
        super().__init__(name=name, data_norm_type=data_norm_type, patch_size=patch_size)
        rngs = rngs if rngs is not None else nnx.Rngs(0)

        tokenizer_config = dict(TokenizerConfigs["CI"].value)
        tokenizer_config.update(dict(spatial_compression=self.patch_size))

        z_factor = tokenizer_config.pop("z_factor")
        z_channels = tokenizer_config.pop("z_channels")
        latent_channels = tokenizer_config.pop("latent_channels")
        self.enc_embed_dim = latent_channels
        encoder_name = kwargs.get("encoder", EncoderType.Default.name)
        self.encoder = EncoderType[encoder_name].value(
            z_channels=z_factor * z_channels, dtype=dtype, param_dtype=param_dtype, rngs=rngs, **tokenizer_config
        )
        self.quant_conv = Conv2dTorch(z_factor * z_channels, z_factor * latent_channels, 1, 1, 0, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        formulation_name = kwargs.get("formulation", ContinuousFormulation.AE.name)
        self.distribution = ContinuousFormulation[formulation_name].value()

        if pretrained_checkpoint_path is not None:
            print(f"Loading custom pretrained Cosmos checkpoint from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], strict=False)

    def encode(self, input_tensor):
        "(B, 3, H, W) in [-1, 1] -> latent (B, 16, H/P, W/P)."
        x = self.encoder(input_tensor)
        x = jnp.transpose(self.quant_conv(jnp.transpose(x, (0, 2, 3, 1))), (0, 3, 1, 2))
        latent, _stats = self.distribution(x)
        return (latent,)

    def __call__(self, encoder_input: ViTEncoderInput) -> ViTEncoderOutput:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        image = encoder_input.image
        assert image.ndim == 4 and image.shape[1] == 3
        height, width = image.shape[-2:]
        assert height % self.patch_size == 0 and width % self.patch_size == 0
        features = self.encode(image)[0]
        return ViTEncoderOutput(features=features)
