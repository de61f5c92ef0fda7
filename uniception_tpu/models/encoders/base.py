"""
Base encoder classes and typed I/O dataclasses.

Behavioral parity with reference uniception/models/encoders/base.py:14-152.
The typed dataclasses are the framework's real API contract; here they are
registered JAX pytrees (flax.struct) so they can cross jit/pjit boundaries:
array fields are leaves, metadata (data_norm_type, ...) is static.

TPU-native notes:
    * gradient checkpointing is exposed as a flag consumed by encoders via
      `jax.checkpoint` on the block loop (instead of the reference's
      module-class-swap trick, encoders/base.py:139-152).
    * `features` keeps the reference's BCHW layout at the API boundary;
      internally encoders work in (B, N, C) tokens.
"""

from typing import Optional

import jax
from flax import nnx, struct

__all__ = [
    "EncoderInput",
    "EncoderOutput",
    "EncoderGlobalRepInput",
    "EncoderGlobalRepOutput",
    "ViTEncoderInput",
    "ViTEncoderNonImageInput",
    "ViTEncoderOutput",
    "UniCeptionEncoderBase",
    "UniCeptionViTEncoderBase",
]


class EncoderInput(struct.PyTreeNode):
    "Base encoder input: carries the normalization-type handshake."

    data_norm_type: str = struct.field(pytree_node=False)


class EncoderOutput(struct.PyTreeNode):
    "Base encoder output."


class EncoderGlobalRepInput(struct.PyTreeNode):
    "Global-representation input: (batch, channel)."

    data: jax.Array
    data_norm_type: str = struct.field(pytree_node=False, default="")


class EncoderGlobalRepOutput(struct.PyTreeNode):
    "Global-representation output: (batch, enc_embed_dim)."

    features: jax.Array


class ViTEncoderInput(struct.PyTreeNode):
    """ViT encoder input.

    image: (batch, channel, height, width), normalized per data_norm_type.
    true_shape: optional (batch, 2) [height, width] actual shapes for
        mixed landscape/portrait batches (ManyAR patch embedding).
    """

    image: jax.Array
    data_norm_type: str = struct.field(pytree_node=False)
    true_shape: Optional[jax.Array] = None


class ViTEncoderNonImageInput(struct.PyTreeNode):
    "Dense 2D-grid non-image input: (batch, channel, height, width)."

    data: jax.Array
    data_norm_type: str = struct.field(pytree_node=False, default="")


class ViTEncoderOutput(struct.PyTreeNode):
    "ViT encoder output: features (batch, enc_embed_dim, h/P, w/P) BCHW."

    features: jax.Array
    registers: Optional[jax.Array] = None


class UniCeptionEncoderBase(nnx.Module):
    "Encoder base class (reference encoders/base.py:43-96)."

    def __init__(
        self,
        name: str,
        data_norm_type: str,
        size: Optional[str] = None,
    ):
        self.name = name
        self.size = size
        self.data_norm_type = data_norm_type

    def _check_data_normalization_type(self, data_norm_type: str):
        "Assert the input's normalization matches this encoder's expectation."
        assert data_norm_type == self.data_norm_type, (
            f"Input normalization type {data_norm_type} does not match the encoder's "
            f"normalization type {self.data_norm_type}."
        )

    def __call__(self, encoder_input: EncoderInput) -> EncoderOutput:
        raise NotImplementedError


class UniCeptionViTEncoderBase(UniCeptionEncoderBase):
    "ViT encoder base class (reference encoders/base.py:121-152)."

    def __init__(
        self,
        patch_size: int,
        gradient_checkpointing: bool = False,
        *args,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.patch_size = patch_size
        self.gradient_checkpointing = gradient_checkpointing
