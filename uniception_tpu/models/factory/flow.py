"""
UFM-style dense-correspondence (optical flow) factory.

The reference's named downstream consumer is UFM — "A Simple Path towards
Unified Dense Correspondence with Flow" (/root/reference/README.md:167-171)
— which composes UniCeption parts into a two-view flow model. This factory
provides that composition natively: CroCo encoder -> two-view
cross-attention info-sharing -> DPT (or linear) head on the SOURCE branch
-> FlowWithConfidenceAdaptor (reference prediction_heads/adaptors.py:25-167
scale strategies, incl. the normalized-coordinate mode where the network
predicts target-pixel positions and the adaptor subtracts the source
coordinate grid).

Differences from the DUSt3R factory: ONE prediction head (flow is
asymmetric source->target; there is no second-view pointmap analogue), a
2+1-channel output (flow xy + confidence), and the flow adaptor's
output-shape-dependent unnormalization. Everything else (pair encoding
with batched same-shape views, scan layout, bf16 trunks with fp32 heads)
rides the same machinery, so the serving/int8/TP paths apply unchanged.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import ViTEncoderInput
from uniception_tpu.models.encoders.croco import CroCoEncoder
from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput
from uniception_tpu.models.info_sharing.cross_attention_transformer import (
    MultiViewCrossAttentionTransformer,
    MultiViewCrossAttentionTransformerIFR,
)
from uniception_tpu.models.prediction_heads.adaptors import FlowWithConfidenceAdaptor
from uniception_tpu.models.prediction_heads.base import (
    AdaptorInput,
    PredictionHeadInput,
    PredictionHeadLayeredInput,
)
from uniception_tpu.models.prediction_heads.linear import LinearFeature
from uniception_tpu.ops.rope import Rope2D
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["UFMFlow"]


class UFMFlow(nnx.Module):
    """Two-view flow-with-confidence model (UFM-style composition).

    ``forward_pair(img1, img2)`` returns ``{"flow": (B, H, W, 2),
    "flow_conf": (B, H, W, 1)}`` — the dense correspondence from view 1
    (source) into view 2 (target) plus per-pixel confidence.
    """

    def __init__(
        self,
        name: str,
        data_norm_type: str = "dust3r",
        img_size: tuple = (224, 224),
        patch_embed_cls: str = "PatchEmbedDust3R",
        pred_head_type: str = "dpt",
        pred_head_feature_dim: int = 256,
        # FlowAdaptor configuration (reference adaptors.py:25-167)
        flow_mean: Tuple[float, float] = (0.0, 0.0),
        flow_std: Tuple[float, float] = (1.0, 1.0),
        flow_base_shape: Optional[Tuple[int, int]] = None,
        scale_strategy: str = "scale_both",
        output_normalized_coordinate: bool = False,
        conf_mode: Tuple[str, float, float] = ("exp", 1, float("inf")),
        pos_embed: str = "RoPE100",
        pretrained_checkpoint_path: Optional[str] = None,
        # size overrides (defaults mirror the DUSt3R factory's reference dims)
        enc_embed_dim: int = 1024,
        enc_depth: int = 24,
        enc_num_heads: int = 16,
        info_sharing_dim: int = 768,
        info_sharing_depth: int = 12,
        info_sharing_num_heads: int = 12,
        gradient_checkpointing: bool = False,
        # None = follow gradient_checkpointing (DPT-head fusion remat; the
        # heads' fp32 upsampled activations dominate dpt training memory)
        head_gradient_checkpointing: Optional[bool] = None,
        scan_blocks: bool = False,
        head_dtype=None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.name = name
        self.data_norm_type = data_norm_type
        self.img_size = img_size
        self.pred_head_type = pred_head_type
        self.head_dtype = head_dtype

        freq = float(pos_embed[len("RoPE"):])
        self.rope = Rope2D(freq=freq)

        self.encoder = CroCoEncoder(
            name=name,
            data_norm_type=data_norm_type,
            patch_embed_cls=patch_embed_cls,
            img_size=img_size,
            enc_embed_dim=enc_embed_dim,
            enc_depth=enc_depth,
            enc_num_heads=enc_num_heads,
            gradient_checkpointing=gradient_checkpointing,
            scan_blocks=scan_blocks,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

        common = dict(
            name="base_info_sharing",
            input_embed_dim=self.encoder.enc_embed_dim,
            num_views=2,
            dim=info_sharing_dim,
            depth=info_sharing_depth,
            num_heads=info_sharing_num_heads,
            custom_positional_encoding=self.rope,
            gradient_checkpointing=gradient_checkpointing,
            scan_blocks=scan_blocks,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        if pred_head_type == "linear":
            self.info_sharing = MultiViewCrossAttentionTransformer(**common)
            self.head = LinearFeature(
                input_feature_dim=info_sharing_dim,
                output_dim=3,
                patch_size=self.encoder.patch_size,
                dtype=head_dtype,
                rngs=rngs,
            )
        elif pred_head_type == "dpt":
            if info_sharing_depth < 2:
                raise ValueError("dpt heads need info_sharing_depth >= 2 for distinct hook indices")
            self.info_sharing = MultiViewCrossAttentionTransformerIFR(
                indices=[5, 8] if info_sharing_depth >= 9 else [0, info_sharing_depth // 2],
                norm_intermediate=False,
                **common,
            )
            from uniception_tpu.models.prediction_heads.dpt import DPTFeature, DPTRegressionProcessor

            head_remat = (
                gradient_checkpointing
                if head_gradient_checkpointing is None
                else head_gradient_checkpointing
            )
            self.dpt_feature_head = DPTFeature(
                patch_size=self.encoder.patch_size,
                hooks=[0, 1, 2, 3],
                input_feature_dims=[enc_embed_dim] + [info_sharing_dim] * 3,
                feature_dim=pred_head_feature_dim,
                checkpoint_gradient=head_remat,
                dtype=head_dtype,
                rngs=rngs,
            )
            self.dpt_regressor_head = DPTRegressionProcessor(
                input_feature_dim=pred_head_feature_dim,
                output_dim=3,
                checkpoint_gradient=head_remat,
                dtype=head_dtype,
                rngs=rngs,
            )
        else:
            raise ValueError(f"Invalid prediction head type: {pred_head_type}. Must be 'linear' or 'dpt'.")

        base_shape = tuple(flow_base_shape) if flow_base_shape is not None else tuple(img_size)
        self.adaptor = FlowWithConfidenceAdaptor(
            name="flow",
            flow_mean=flow_mean,
            flow_std=flow_std,
            base_shape=base_shape,
            scale_strategy=scale_strategy,
            output_normalized_coordinate=output_normalized_coordinate,
            confidence_type=conf_mode[0],
            vmin=conf_mode[1],
            vmax=conf_mode[2],
        )

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained UFMFlow weights from {pretrained_checkpoint_path} ...")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])

    def checkpoint_alias_patterns(self) -> tuple:
        "Torch-side duplicate-key patterns (same convention as DUSt3R.checkpoint_alias_patterns)."
        if self.pred_head_type == "dpt":
            from uniception_tpu.models.prediction_heads.dpt import DPT_CHECKPOINT_ALIASES

            return DPT_CHECKPOINT_ALIASES
        return ()

    # --- forward -----------------------------------------------------------

    def _encode_pair(self, img1, img2):
        "Same-shape views batch through the encoder once (DUSt3R factory pattern)."
        if img1.shape[-2:] == img2.shape[-2:]:
            out = self.encoder(
                ViTEncoderInput(
                    image=jnp.concatenate([img1, img2], axis=0), data_norm_type=self.data_norm_type
                )
            )
            feat1, feat2 = jnp.split(out.features, 2, axis=0)
        else:
            feat1 = self.encoder(ViTEncoderInput(image=img1, data_norm_type=self.data_norm_type)).features
            feat2 = self.encoder(ViTEncoderInput(image=img2, data_norm_type=self.data_norm_type)).features
        return feat1, feat2

    def forward_pair(self, img1, img2):
        """Dense flow view1 -> view2.

        Args:
            img1/img2: (B, 3, H, W) normalized images (source, target).

        Returns:
            dict with "flow" (B, H, W, 2) and "flow_conf" (B, H, W, 1).
        """
        shape = (int(img1.shape[-2]), int(img1.shape[-1]))
        feat1, feat2 = self._encode_pair(img1, img2)
        hd = self.head_dtype or jnp.float32

        if self.pred_head_type == "linear":
            final = self.info_sharing(MultiViewTransformerInput(features=[feat1, feat2]))
            head_out = self.head(PredictionHeadInput(last_feature=final.features[0].astype(hd)))
        else:
            final, intermediate = self.info_sharing(MultiViewTransformerInput(features=[feat1, feat2]))
            layered = [
                feat1.astype(hd),
                intermediate[0].features[0].astype(hd),
                intermediate[1].features[0].astype(hd),
                final.features[0].astype(hd),
            ]
            feats = self.dpt_feature_head(
                PredictionHeadLayeredInput(list_features=layered, target_output_shape=shape)
            )
            head_out = self.dpt_regressor_head(feats)

        # adaptor nonlinearities (unnormalize/exp) always in fp32
        out = self.adaptor(
            AdaptorInput(
                adaptor_feature=head_out.decoded_channels.astype(jnp.float32), output_shape_hw=shape
            )
        )
        return {
            "flow": jnp.transpose(out.value, (0, 2, 3, 1)),
            "flow_conf": jnp.transpose(out.confidence, (0, 2, 3, 1)),
        }
