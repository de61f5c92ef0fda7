"""
MLP feature head: token-wise MLP + 1x1 conv + pixel shuffle.

Parity with reference uniception/models/prediction_heads/mlp_feature.py:16-104.
"""

from typing import Optional, Union

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.prediction_heads.base import PixelTaskOutput, PredictionHeadInput
from uniception_tpu.nn.blocks import Mlp
from uniception_tpu.nn.common import gelu_exact
from uniception_tpu.ops.pixel_shuffle import pixel_shuffle
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["MLPFeature"]


class MLPFeature(nnx.Module):
    "Linear pixel-wise mapping with an intermediate MLP."

    def __init__(
        self,
        input_feature_dim: Union[int, str],
        patch_size: int,
        output_dim: int,
        mlp_ratio: int = 4,
        act_layer=gelu_exact,
        bias=True,
        drop=0.0,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        if isinstance(input_feature_dim, str):
            input_feature_dim = eval(input_feature_dim)  # noqa: S307 - reference-compatible ("768*2" style)
        self.input_feature_dim = input_feature_dim
        self.output_dim = output_dim
        self.patch_size = patch_size

        self.mlp = Mlp(
            in_features=input_feature_dim,
            hidden_features=int(mlp_ratio * input_feature_dim),
            act_layer=act_layer,
            drop=drop,
            bias=bias,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.linear = nnx.Conv(
            input_feature_dim,
            output_dim * patch_size**2,
            kernel_size=(1, 1),
            strides=(1, 1),
            padding="VALID",
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained MLP dense feature head from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])

    def __call__(self, feature_input: PredictionHeadInput) -> PixelTaskOutput:
        x = feature_input.last_feature  # BCHW
        assert x.shape[1] == self.input_feature_dim, (
            f"Input feature dimension mismatch: {x.shape[1]} != {self.input_feature_dim}"
        )
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = self.mlp(x)
        x = self.linear(x)
        x = jnp.transpose(x, (0, 3, 1, 2))
        x = pixel_shuffle(x, self.patch_size)
        return PixelTaskOutput(decoded_channels=x)
