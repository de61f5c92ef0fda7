"""
MLP head converting tokens to a target representation.

Parity with reference uniception/models/prediction_heads/mlp_head.py:13-94.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.prediction_heads.base import PredictionHeadTokenInput, SummaryTaskOutput
from uniception_tpu.nn.common import LinearX
from uniception_tpu.nn.dpt_parts import Seq
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["MLPHead"]


class MLPHead(nnx.Module):
    "proj -> n x (Linear + ReLU) -> output proj over (B, C, T) tokens."

    def __init__(
        self,
        input_feature_dim: int,
        output_dim: int,
        num_mlp_layers: int = 2,
        hidden_dim: int = 196,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.input_feature_dim = input_feature_dim
        self.num_mlp_layers = num_mlp_layers
        self.hidden_dim = hidden_dim

        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj = LinearX(input_feature_dim, hidden_dim, **kw)
        self.mlp = nnx.List([Seq(LinearX(hidden_dim, hidden_dim, **kw), jax.nn.relu) for _ in range(num_mlp_layers)])
        self.output_proj = LinearX(hidden_dim, output_dim, **kw)

        if pretrained_checkpoint_path:
            print(f"Loading pretrained mlp head from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])

    def __call__(self, feature_input: PredictionHeadTokenInput) -> SummaryTaskOutput:
        feat = feature_input.last_feature  # (B, C, T)
        assert feat.ndim == 3, f"Input feature tensor must have 3 dimensions (B, C, T), got {feat.ndim}"
        assert feat.shape[1] == self.input_feature_dim
        feat = jnp.transpose(feat, (0, 2, 1))  # (B, T, C)
        feat = self.proj(feat)
        for layer in self.mlp:
            feat = layer(feat)
        out = self.output_proj(feat)
        return SummaryTaskOutput(decoded_channels=jnp.transpose(out, (0, 2, 1)))
