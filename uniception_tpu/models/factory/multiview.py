"""
Multi-view N-frame pointmap model (the "4D stretch" configuration from
BASELINE.json): shared CroCo/DINOv2-style encoder -> multi-view
alternating- or global-attention info sharing -> a shared per-view head ->
pointmap+confidence adaptor.

The reference has no such composed factory (its only factory is the
two-view DUSt3R, factory/dust3r.py); this extends the same composition
pattern to N frames, which is where the single-stream global attention and
the Pallas flash-attention kernel earn their keep (V*T tokens).
"""

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import ViTEncoderInput
from uniception_tpu.models.encoders.croco import CroCoEncoder
from uniception_tpu.models.info_sharing.alternating_attention_transformer import (
    MultiViewAlternatingAttentionTransformer,
)
from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput
from uniception_tpu.models.info_sharing.global_attention_transformer import (
    MultiViewGlobalAttentionTransformer,
)
from uniception_tpu.models.prediction_heads.adaptors import PointMapWithConfidenceAdaptor
from uniception_tpu.models.prediction_heads.base import AdaptorInput, PredictionHeadInput
from uniception_tpu.models.prediction_heads.linear import LinearFeature

__all__ = ["MultiViewPointmapModel"]


class MultiViewPointmapModel(nnx.Module):
    "N-frame pointmap regression with a single shared head across views."

    def __init__(
        self,
        name: str,
        num_views: int,
        data_norm_type: str = "dust3r",
        img_size: tuple = (224, 224),
        attention_type: str = "alternating",  # or "global"
        pred_head_output_dim: int = 4,
        depth_mode: Tuple[str, float, float] = ("exp", -float("inf"), float("inf")),
        conf_mode: Tuple[str, float, float] = ("exp", 1, float("inf")),
        enc_embed_dim: int = 1024,
        enc_depth: int = 24,
        enc_num_heads: int = 16,
        info_sharing_dim: int = 768,
        info_sharing_depth: int = 12,
        info_sharing_num_heads: int = 12,
        use_rand_idx_pe_for_non_reference_views: bool = False,
        sequence_parallel: Optional[tuple] = None,
        scan_blocks: bool = False,
        gradient_checkpointing: bool = False,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.name = name
        self.num_views = num_views
        self.data_norm_type = data_norm_type
        # (mesh, axis_name) or None: when set, the info-sharing V*T token
        # axis is sharded over the mesh axis and self-attention routes
        # through ring attention (parallel/ring_attention.py) — exact SP for
        # many-view global attention (SURVEY.md §5 long-context row)
        self.sequence_parallel = sequence_parallel

        self.encoder = CroCoEncoder(
            name=name,
            data_norm_type=data_norm_type,
            patch_embed_cls="PatchEmbedDust3R",
            img_size=img_size,
            enc_embed_dim=enc_embed_dim,
            enc_depth=enc_depth,
            enc_num_heads=enc_num_heads,
            scan_blocks=scan_blocks,
            gradient_checkpointing=gradient_checkpointing,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

        info_cls = {
            "alternating": MultiViewAlternatingAttentionTransformer,
            "global": MultiViewGlobalAttentionTransformer,
        }[attention_type]
        self.info_sharing = info_cls(
            name="multi_view_info_sharing",
            input_embed_dim=enc_embed_dim,
            dim=info_sharing_dim,
            depth=info_sharing_depth,
            num_heads=info_sharing_num_heads,
            use_rand_idx_pe_for_non_reference_views=use_rand_idx_pe_for_non_reference_views,
            scan_blocks=scan_blocks,
            gradient_checkpointing=gradient_checkpointing,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

        self.head = LinearFeature(
            input_feature_dim=info_sharing_dim,
            output_dim=pred_head_output_dim,
            patch_size=self.encoder.patch_size,
            rngs=rngs,
        )
        self.adaptor = PointMapWithConfidenceAdaptor(
            name="pointmap",
            pointmap_mode=depth_mode[0],
            pointmap_vmin=depth_mode[1],
            pointmap_vmax=depth_mode[2],
            confidence_type=conf_mode[0],
            confidence_vmin=conf_mode[1],
            confidence_vmax=conf_mode[2],
        )

    def __call__(self, views: List[jnp.ndarray], rng_key=None):
        """views: list of (B, 3, H, W) normalized frames.

        Returns a list of per-view dicts with pts3d (BHWC) and conf.
        """
        assert len(views) == self.num_views
        B = views[0].shape[0]
        H, W = views[0].shape[-2:]

        # shared encoder over the folded view batch (one pass)
        stacked = jnp.concatenate(views, axis=0)  # (V*B, 3, H, W)
        feats = self.encoder(ViTEncoderInput(image=stacked, data_norm_type=self.data_norm_type)).features
        per_view = jnp.split(feats, self.num_views, axis=0)

        if self.sequence_parallel is not None:
            from uniception_tpu.ops.attention import sequence_parallel as _sp_ctx

            mesh, axis = self.sequence_parallel
            with _sp_ctx(mesh, axis):
                out = self.info_sharing(MultiViewTransformerInput(features=list(per_view)), rng_key=rng_key)
        else:
            out = self.info_sharing(MultiViewTransformerInput(features=list(per_view)), rng_key=rng_key)

        results = []
        for v in range(self.num_views):
            head_out = self.head(PredictionHeadInput(last_feature=out.features[v].astype(jnp.float32)))
            adapted = self.adaptor(AdaptorInput(adaptor_feature=head_out.decoded_channels, output_shape_hw=(H, W)))
            results.append(
                {
                    "pts3d": jnp.transpose(adapted.value, (0, 2, 3, 1)),
                    "conf": jnp.transpose(adapted.confidence, (0, 2, 3, 1)),
                }
            )
        return results
