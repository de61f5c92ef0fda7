"""
CroCo / DUSt3R / MASt3R ViT encoder.

Behavioral parity with reference uniception/models/encoders/croco.py:18-327:
patch-embed -> depth x pre-norm attention blocks with shared 2D RoPE ->
final LayerNorm -> BCHW feature grid. Checkpoint contract preserved
(``ckpt["model"]`` + data_norm_type / patch_embed_cls asserts,
croco.py:99-111) — reference .pth checkpoints load unconverted.

TPU-native notes:
    * RoPE is the Pallas/jnp Rope2D (ops/rope.py) instead of the CUDA
      extension; positions come from the patch embed.
    * gradient checkpointing uses jax.checkpoint (nnx.remat) on each block
      instead of the reference's class-swap wrapper.
    * compute dtype is explicit (bf16 trunk / f32 params for production).
"""

from typing import Callable, List, Optional, Tuple, Union

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.nn.common import remat_call

from uniception_tpu.models.encoders.base import UniCeptionViTEncoderBase, ViTEncoderInput, ViTEncoderOutput
from uniception_tpu.models.encoders.patch_embed import get_patch_embed
from uniception_tpu.models.utils.intermediate_feature_return import (
    IntermediateFeatureReturner,
    feature_take_indices,
)
from uniception_tpu.nn.blocks import SelfAttentionBlock, layer_norm_factory
from uniception_tpu.nn.scan import make_stacked_blocks, scan_blocks as apply_scan_blocks
from uniception_tpu.ops.rope import Rope2D
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["CroCoEncoder", "CroCoIntermediateFeatureReturner"]


class CroCoEncoder(UniCeptionViTEncoderBase):
    "UniCeption CroCov2 encoder (TPU-native)."

    def __init__(
        self,
        name: str,
        data_norm_type: str,
        patch_embed_cls: str = "PatchEmbedDust3R",
        img_size: Union[int, Tuple[int, int]] = (224, 224),
        patch_size: int = 16,
        enc_embed_dim: int = 1024,
        enc_depth: int = 24,
        enc_num_heads: int = 16,
        mlp_ratio: int = 4,
        norm_layer: Optional[Callable] = None,
        pos_embed: str = "RoPE100",
        pretrained_checkpoint_path: Optional[str] = None,
        override_checkpoint_attributes: bool = False,
        gradient_checkpointing: bool = False,
        scan_blocks: bool = False,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        super().__init__(
            name=name,
            data_norm_type=data_norm_type,
            patch_size=patch_size,
            gradient_checkpointing=gradient_checkpointing,
        )
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        norm_layer = norm_layer or layer_norm_factory(eps=1e-6)

        self.patch_embed_cls = patch_embed_cls
        self.img_size = img_size
        self.enc_embed_dim = enc_embed_dim
        self.enc_depth = enc_depth
        self.enc_num_heads = enc_num_heads
        self.mlp_ratio = mlp_ratio
        self.pretrained_checkpoint_path = pretrained_checkpoint_path
        self.override_checkpoint_attributes = override_checkpoint_attributes

        # Positional embedding: RoPE<freq> (croco.py:77-87)
        self.pos_embed = pos_embed
        if pos_embed.startswith("RoPE"):
            freq = float(pos_embed[len("RoPE"):])
            self.rope = Rope2D(freq=freq)
        else:
            raise NotImplementedError(f"Unknown pos_embed {pos_embed}")

        self.patch_embed = get_patch_embed(
            patch_embed_cls, img_size, patch_size, enc_embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

        def make_block(r: nnx.Rngs) -> SelfAttentionBlock:
            return SelfAttentionBlock(
                dim=enc_embed_dim,
                num_heads=enc_num_heads,
                mlp_ratio=mlp_ratio,
                qkv_bias=True,
                norm_layer=norm_layer,
                custom_positional_encoding=self.rope,
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=r,
            )

        # scan_blocks: store ONE block with depth-stacked params and run
        # lax.scan over the depth axis — the block traces once (fast
        # compiles) and the layout is pipeline-parallel ready (nn/scan.py).
        self.scan_blocks = scan_blocks
        if scan_blocks:
            self.enc_blocks = make_stacked_blocks(enc_depth, make_block, rngs)
        else:
            self.enc_blocks = nnx.List([make_block(rngs) for _ in range(enc_depth)])
        self.enc_norm = norm_layer(enc_embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        if pretrained_checkpoint_path:
            print(f"Loading pretrained CroCo checkpoint from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])
            if not override_checkpoint_attributes:
                assert data_norm_type == ckpt["data_norm_type"], (
                    f"Data normalization type {data_norm_type} does not match the checkpoint {ckpt['data_norm_type']}."
                )
                assert patch_embed_cls == ckpt["patch_embed_cls"], (
                    f"Patch embedding class {patch_embed_cls} does not match the checkpoint {ckpt['patch_embed_cls']}."
                )

    # --- internals -------------------------------------------------------

    def _embed(self, encoder_input: ViTEncoderInput):
        self._check_data_normalization_type(encoder_input.data_norm_type)
        batch_size, _, height, width = encoder_input.image.shape
        true_shape = encoder_input.true_shape
        if true_shape is None:
            true_shape = jnp.broadcast_to(jnp.asarray([height, width], dtype=jnp.int32), (batch_size, 2))
        features, pos = self.patch_embed(encoder_input.image, true_shape=true_shape)
        return features, pos, (height, width)

    def _block_apply(self, blk, features, pos):
        if self.gradient_checkpointing:
            return remat_call(blk, features, pos)
        return blk(features, pos)

    def _to_bchw(self, features, height, width):
        "(B, N, C) -> (B, C, H/P, W/P), matching croco.py:176-180."
        B = features.shape[0]
        features = features.reshape(B, height // self.patch_size, width // self.patch_size, self.enc_embed_dim)
        return jnp.transpose(features, (0, 3, 1, 2))

    # --- public forward ---------------------------------------------------

    def __call__(self, encoder_input: ViTEncoderInput) -> ViTEncoderOutput:
        features, pos, (height, width) = self._embed(encoder_input)
        if self.scan_blocks:
            features = apply_scan_blocks(self.enc_blocks, features, pos, remat=self.gradient_checkpointing)
        else:
            for blk in self.enc_blocks:
                features = self._block_apply(blk, features, pos)
        features = self.enc_norm(features)
        return ViTEncoderOutput(features=self._to_bchw(features, height, width))


class CroCoIntermediateFeatureReturner(CroCoEncoder, IntermediateFeatureReturner):
    "CroCo encoder returning intermediate block features (croco.py:185-327)."

    def __init__(
        self,
        *args,
        indices: Optional[Union[int, List[int]]] = None,
        norm_intermediate: bool = True,
        stop_early: bool = False,
        intermediates_only: bool = True,
        **kwargs,
    ):
        CroCoEncoder.__init__(self, *args, **kwargs)
        IntermediateFeatureReturner.__init__(
            self,
            indices=indices,
            norm_intermediate=norm_intermediate,
            stop_early=stop_early,
            intermediates_only=intermediates_only,
        )

    def __call__(
        self, encoder_input: ViTEncoderInput
    ) -> Union[List[ViTEncoderOutput], Tuple[ViTEncoderOutput, List[ViTEncoderOutput]]]:
        features, pos, (height, width) = self._embed(encoder_input)

        take_indices, max_index = feature_take_indices(self.enc_depth, self.indices)

        if self.scan_blocks:
            # scan layout: collect every depth's output, select statically.
            # (stop_early is a no-op here — the scan always runs full depth.)
            features, per_depth = apply_scan_blocks(
                self.enc_blocks, features, pos, collect=True, remat=self.gradient_checkpointing
            )
            intermediates = [
                self.enc_norm(per_depth[i]) if self.norm_intermediate else per_depth[i] for i in take_indices
            ]
        else:
            blocks = self.enc_blocks[: max_index + 1] if self.stop_early else list(self.enc_blocks)
            intermediates = []
            for blk_idx, blk in enumerate(blocks):
                features = self._block_apply(blk, features, pos)
                if blk_idx in take_indices:
                    intermediates.append(self.enc_norm(features) if self.norm_intermediate else features)

        intermediates = [ViTEncoderOutput(features=self._to_bchw(f, height, width)) for f in intermediates]

        if self.intermediates_only:
            return intermediates

        features = self.enc_norm(features)
        final = ViTEncoderOutput(features=self._to_bchw(features, height, width))
        return final, intermediates


if __name__ == "__main__":
    # smoke asserts (reference croco.py:330-457 style): ctor + forward + IFR
    import numpy as np

    from uniception_tpu.models.encoders.base import ViTEncoderInput

    enc = CroCoEncoder(name="croco", data_norm_type="croco", enc_embed_dim=64, enc_depth=2, enc_num_heads=4, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32))
    out = enc(ViTEncoderInput(image=x, data_norm_type="croco"))
    assert out.features.shape == (1, 64, 14, 14), out.features.shape

    ifr = CroCoIntermediateFeatureReturner(
        name="croco", data_norm_type="croco", enc_embed_dim=64, enc_depth=2, enc_num_heads=4, indices=[0, 1], rngs=nnx.Rngs(0)
    )
    feats = ifr(ViTEncoderInput(image=x, data_norm_type="croco"))
    assert len(feats) == 2 and feats[0].features.shape == (1, 64, 14, 14)
    print("croco encoder smoke: OK")
