"""
Global Representation Encoder: MLP stack projecting a (B, C) vector to the
encoder embedding dim.

Parity with reference uniception/models/encoders/global_rep_encoder.py:14-108,
including the nested-Sequential state-dict key layout produced by the
reference's iterative Sequential wrapping (encoder.0.0.0.0.weight, ...).
"""

from typing import Callable, List, Optional

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import EncoderGlobalRepInput, EncoderGlobalRepOutput
from uniception_tpu.nn.blocks import layer_norm_factory
from uniception_tpu.nn.common import Identity, LinearX, gelu_exact
from uniception_tpu.nn.dpt_parts import Seq
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["GlobalRepresentationEncoder"]


class GlobalRepresentationEncoder(nnx.Module):
    "UniCeption Global Representation Encoder."

    def __init__(
        self,
        name: str,
        in_chans: int = 3,
        enc_embed_dim: int = 1024,
        intermediate_dims: List[int] = [128, 256, 512],
        act_layer: Callable = gelu_exact,
        norm_layer: Optional[Callable] = layer_norm_factory(eps=1e-6),
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.name = name
        self.in_chans = in_chans
        self.enc_embed_dim = enc_embed_dim
        self.intermediate_dims = intermediate_dims

        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        # replicate the reference's nested-Sequential structure so keys match
        encoder = Seq(LinearX(in_chans, intermediate_dims[0], **kw), act_layer)
        for i in range(1, len(intermediate_dims)):
            encoder = Seq(encoder, LinearX(intermediate_dims[i - 1], intermediate_dims[i], **kw), act_layer)
        self.encoder = Seq(encoder, LinearX(intermediate_dims[-1], enc_embed_dim, **kw))

        self.norm_layer = norm_layer(enc_embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if norm_layer else Identity()

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained Global Representation Encoder checkpoint from {pretrained_checkpoint_path} ...")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])

    def __call__(self, encoder_input: EncoderGlobalRepInput) -> EncoderGlobalRepOutput:
        input_data = encoder_input.data
        assert input_data.ndim == 2, "Input data must have shape (B, C)"
        assert input_data.shape[1] == self.in_chans, f"Input data must have {self.in_chans} channels"
        features = self.encoder(input_data)
        features = self.norm_layer(features)
        return EncoderGlobalRepOutput(features=features)
