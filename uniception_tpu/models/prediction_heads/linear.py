"""
Linear prediction head: 1x1 conv to out_dim * P^2 channels + pixel shuffle.

Parity with reference uniception/models/prediction_heads/linear.py:15-84.
The 1x1 conv is expressed as a Linear over channel-last tokens (identical
math, MXU-friendly); the state-dict key stays ``linear.weight`` with the
(out, in, 1, 1) conv layout handled by the loader.
"""

from typing import Optional

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.prediction_heads.base import PixelTaskOutput, PredictionHeadInput
from uniception_tpu.ops.pixel_shuffle import pixel_shuffle
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["LinearFeature"]


class LinearFeature(nnx.Module):
    "Linear mapping from patch features to pixel-wise features."

    def __init__(
        self,
        input_feature_dim: int,
        output_dim: int,
        patch_size: int,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.input_feature_dim = input_feature_dim
        self.output_dim = output_dim
        self.patch_size = patch_size

        # 1x1 conv == pointwise Linear; stored as nnx.Conv so the checkpoint
        # key/layout matches the reference's nn.Conv2d (linear.py:47-54).
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
            print(f"Loading pretrained linear dense feature head from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])

    def __call__(self, feature_input: PredictionHeadInput) -> PixelTaskOutput:
        x = feature_input.last_feature  # (B, C, H, W)
        assert x.shape[1] == self.input_feature_dim, (
            f"Input feature dimension mismatch: {x.shape[1]} != {self.input_feature_dim}"
        )
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for the pointwise conv
        x = self.linear(x)
        x = jnp.transpose(x, (0, 3, 1, 2))
        x = pixel_shuffle(x, self.patch_size)
        return PixelTaskOutput(decoded_channels=x)
