"""
DINOv2 encoder (ViT-S/B/L/g, with or without registers).

Behavioral parity with reference uniception/models/encoders/dinov2.py:15-386,
with one structural difference: the reference pulls the trunk from torch.hub
at runtime (dinov2.py:90-102); here the DINOv2 architecture is self-contained
(models/encoders/vit.py) and weights load from converted checkpoints. The
wrapper keeps the trunk under the ``model`` attribute so checkpoint keys
("model.patch_embed.proj.weight", ...) match the reference exactly.
"""

from typing import List, Optional, Union

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import UniCeptionViTEncoderBase, ViTEncoderInput, ViTEncoderOutput
from uniception_tpu.models.encoders.vit import DINO_VIT_CONFIGS, DinoVisionTransformer
from uniception_tpu.models.utils.intermediate_feature_return import (
    IntermediateFeatureReturner,
    feature_take_indices,
)
from uniception_tpu.nn.common import Identity
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["DINOv2Encoder", "DINOv2IntermediateFeatureReturner"]


class DINOv2Encoder(UniCeptionViTEncoderBase):
    "UniCeption DINOv2 encoder (self-contained, no torch.hub)."

    def __init__(
        self,
        name: str,
        data_norm_type: str = "dinov2",
        patch_size: int = 14,
        size: str = "large",
        with_registers: bool = False,
        norm_returned_features: bool = True,
        pretrained_checkpoint_path: Optional[str] = None,
        gradient_checkpointing: bool = False,
        keep_first_n_layers: Optional[int] = None,
        scan_blocks: bool = False,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
        **_compat_kwargs,  # torch_hub_* / use_pytorch_sdpa accepted and ignored
    ):
        name = name if not with_registers else f"{name}_reg"
        super().__init__(
            name=name,
            data_norm_type=data_norm_type,
            patch_size=patch_size,
            gradient_checkpointing=gradient_checkpointing,
        )
        rngs = rngs if rngs is not None else nnx.Rngs(0)

        self.version = size
        self.with_registers = with_registers
        self.norm_returned_features = norm_returned_features
        cfg = dict(DINO_VIT_CONFIGS[size])
        self.enc_embed_dim = cfg["embed_dim"]

        self.model = DinoVisionTransformer(
            img_size=518,
            patch_size=patch_size,
            num_register_tokens=4 if with_registers else 0,
            scan_blocks=scan_blocks,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
            **cfg,
        )
        if keep_first_n_layers is not None:
            if scan_blocks:
                # truncate the stacked depth axis (dinov2.py:117 semantics)
                import jax

                graphdef, state = nnx.split(self.model.blocks)
                self.model.blocks = nnx.merge(graphdef, jax.tree.map(lambda a: a[:keep_first_n_layers], state))
                self.model.blocks.stacked_depth = keep_first_n_layers
            else:
                self.model.blocks = nnx.List(list(self.model.blocks)[:keep_first_n_layers])
            self.model.depth = keep_first_n_layers
        if not norm_returned_features:
            self.model.norm = Identity()

        if pretrained_checkpoint_path:
            print(f"Loading custom pretrained DINOv2 checkpoint from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            # drop the unused mask_token if present (reference deletes it, dinov2.py:104)
            state = {k: v for k, v in ckpt["model"].items() if "mask_token" not in k}
            load_torch_state_dict(self, state)

    def _check_image(self, image):
        assert image.ndim == 4, "Input must be of shape (B, C, H, W)"
        _, channels, height, width = image.shape
        assert channels == 3, "Input must have 3 channels"
        assert height % self.patch_size == 0 and width % self.patch_size == 0, (
            f"Input shape must be divisible by patch size: {self.patch_size}"
        )
        return height, width

    def _patch_to_bchw(self, patch_tokens, height, width):
        B = patch_tokens.shape[0]
        hp, wp = height // self.patch_size, width // self.patch_size
        return jnp.transpose(patch_tokens.reshape(B, hp, wp, self.enc_embed_dim), (0, 3, 1, 2))

    def __call__(self, encoder_input: ViTEncoderInput) -> ViTEncoderOutput:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        height, width = self._check_image(encoder_input.image)

        result = self.model.forward_features(encoder_input.image)
        features = self._patch_to_bchw(result["x_norm_patchtokens"], height, width)

        regs = [result["x_norm_clstoken"][:, None, :]]
        if self.with_registers:
            regs.append(result["x_norm_regtokens"])
        registers = jnp.transpose(jnp.concatenate(regs, axis=1), (0, 2, 1))  # (B, D, R)

        return ViTEncoderOutput(features=features, registers=registers)


class DINOv2IntermediateFeatureReturner(DINOv2Encoder, IntermediateFeatureReturner):
    "DINOv2 encoder returning intermediate layers (dinov2.py:219-333)."

    def __init__(
        self,
        *args,
        indices: Optional[Union[int, List[int]]] = 1,
        norm_intermediate: bool = True,
        **kwargs,
    ):
        DINOv2Encoder.__init__(self, *args, **kwargs)
        IntermediateFeatureReturner.__init__(self, indices=indices, norm_intermediate=norm_intermediate)

    def __call__(self, encoder_input: ViTEncoderInput) -> List[ViTEncoderOutput]:
        self._check_data_normalization_type(encoder_input.data_norm_type)
        height, width = self._check_image(encoder_input.image)

        take_indices, max_index = feature_take_indices(self.model.depth, self.indices)
        _, collected, _ = self.model.forward_tokens(
            encoder_input.image, n_blocks=max_index + 1, collect_indices=set(take_indices)
        )

        outputs = []
        for i in take_indices:
            tokens = collected[i]
            if self.norm_intermediate:
                tokens = self.model.norm(tokens)
            _, _, patch_tokens = self.model.split_tokens(tokens)
            outputs.append(ViTEncoderOutput(features=self._patch_to_bchw(patch_tokens, height, width)))
        return outputs
