"""
DUSt3R: two-view pointmap model composed from UniCeption-TPU modules.

Behavioral parity with reference uniception/models/factory/dust3r.py:40-332:
shared CroCo ViT-L encoder -> 2-view cross-attention transformer (+2D RoPE)
-> per-view Linear or DPT heads -> PointMapWithConfidence adaptor.

TPU-native notes:
    * the whole forward is jit-compatible with static shapes; use
      :meth:`forward_pair` (pure arrays) under jax.jit/pjit for production.
    * symmetrized-pair dedup (is_symmetrized/interleave,
      factory/dust3r.py:21-37) is host-side logic over instance ids, exactly
      as in the reference; the deduped encoder batch keeps shapes static.
    * the reference runs heads under autocast(enabled=False)
      (factory/dust3r.py:309); here the trunk runs in `dtype` (bf16 in
      production) and features are cast to fp32 before the heads/adaptors.
"""

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.base import ViTEncoderInput
from uniception_tpu.models.encoders.croco import CroCoEncoder
from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput
from uniception_tpu.models.info_sharing.cross_attention_transformer import (
    MultiViewCrossAttentionTransformer,
    MultiViewCrossAttentionTransformerIFR,
)
from uniception_tpu.models.prediction_heads.adaptors import PointMapWithConfidenceAdaptor
from uniception_tpu.models.prediction_heads.base import (
    AdaptorInput,
    PredictionHeadInput,
    PredictionHeadLayeredInput,
)
from uniception_tpu.models.prediction_heads.linear import LinearFeature
from uniception_tpu.models.utils.positional_encoding import make_patch_positions
from uniception_tpu.ops.rope import Rope2D
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["DUSt3R", "is_symmetrized", "interleave"]


def is_symmetrized(gt1, gt2) -> bool:
    "True when input pairs are symmetrized: (a, b) and (b, a) both present (dust3r.py:21-30)."
    x = gt1["instance"]
    y = gt2["instance"]
    if len(x) == len(y) and len(x) == 1:
        return False
    ok = True
    for i in range(0, len(x), 2):
        ok = ok and (x[i] == y[i + 1]) and (x[i + 1] == y[i])
    return ok


def interleave(tensor1, tensor2):
    "Re-expand deduped symmetric features: rows (a, b) -> (a, b), (b, a) (dust3r.py:33-37)."
    res1 = jnp.stack([tensor1, tensor2], axis=1).reshape((-1,) + tensor1.shape[1:])
    res2 = jnp.stack([tensor2, tensor1], axis=1).reshape((-1,) + tensor2.shape[1:])
    return res1, res2


class DUSt3R(nnx.Module):
    "DUSt3R defined with UniCeption-TPU modules."

    def __init__(
        self,
        name: str,
        data_norm_type: str = "dust3r",
        img_size: tuple = (224, 224),
        patch_embed_cls: str = "PatchEmbedDust3R",
        pred_head_type: str = "linear",
        pred_head_output_dim: int = 4,
        pred_head_feature_dim: int = 256,
        depth_mode: Tuple[str, float, float] = ("exp", -float("inf"), float("inf")),
        conf_mode: Tuple[str, float, float] = ("exp", 1, float("inf")),
        pos_embed: str = "RoPE100",
        pretrained_checkpoint_path: Optional[str] = None,
        pretrained_encoder_checkpoint_path: Optional[str] = None,
        pretrained_info_sharing_checkpoint_path: Optional[str] = None,
        pretrained_pred_head_checkpoint_paths: Optional[List[Optional[str]]] = None,
        pretrained_pred_head_regressor_checkpoint_paths: Optional[List[Optional[str]]] = None,
        override_encoder_checkpoint_attributes: bool = False,
        # size overrides (extension over the reference, which hardcodes
        # ViT-L encoder + 768/12 decoder; defaults match the reference)
        enc_embed_dim: int = 1024,
        enc_depth: int = 24,
        enc_num_heads: int = 16,
        info_sharing_dim: int = 768,
        info_sharing_depth: int = 12,
        info_sharing_num_heads: int = 12,
        gradient_checkpointing: bool = False,
        # remat for the DPT heads' fusion pyramid + regressor (their fp32
        # 8x-upsampled activations, not the trunk, set the dpt training
        # memory boundary — BASELINE.md round-4 dpt ledger). None = follow
        # gradient_checkpointing; pass an explicit bool to split the knobs
        # (head-only remat keeps the trunk activation-cache intact).
        head_gradient_checkpointing: Optional[bool] = None,
        scan_blocks: bool = False,
        head_dtype=None,
        landscape_only: bool = False,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        # head_dtype: compute dtype for the prediction heads. None keeps the
        # reference's fp32 head region (autocast-off, dust3r.py:309). Setting
        # jnp.bfloat16 is an opt-in serving knob: measured full-size head
        # error vs the fp32 path stays ~1e-3 — far inside the reference's own
        # 1e-2 golden gate — while the conv-heavy DPT head runs at bf16 rate.
        #
        # landscape_only: make ManyAR mixed-orientation batches END-TO-END
        # correct. The reference documents this flag but never implements it
        # (factory/dust3r.py:83 — accepted and unused), so its portrait
        # samples get canvas-grid RoPE positions in the decoder and
        # canvas-scrambled head outputs; vanilla CroCo solves it dynamically
        # (transpose_to_landscape), which is data-dependent control flow and
        # un-jittable. The TPU-native version is static: true per-sample
        # positions ride into the info-sharing RoPE, and the heads run TWICE
        # (canvas grid + transposed token grid) with a per-sample
        # jnp.where-select — 2x head cost, zero dynamic shapes. Default False
        # (= the reference's actual behavior). Only active when true_shape is
        # passed and the patch embed is ManyAR. Outputs stay canvas-layout
        # (portrait rows spatially transposed, like the inputs); see
        # uniception_tpu.data.bucketing.extract_view for unpacking.
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        head_remat = (
            gradient_checkpointing if head_gradient_checkpointing is None else head_gradient_checkpointing
        )
        if pretrained_pred_head_checkpoint_paths is None:
            pretrained_pred_head_checkpoint_paths = [None, None]
        if pretrained_pred_head_regressor_checkpoint_paths is None:
            pretrained_pred_head_regressor_checkpoint_paths = [None, None]

        self.name = name
        self.data_norm_type = data_norm_type
        self.img_size = img_size
        self.patch_embed_cls = patch_embed_cls
        self.pred_head_type = pred_head_type
        self.pred_head_output_dim = pred_head_output_dim
        self.head_dtype = head_dtype
        self.landscape_only = landscape_only
        self.depth_mode = depth_mode
        self.conf_mode = conf_mode
        self.pos_embed = pos_embed

        # Shared RoPE for encoder + info sharing (dust3r.py:110-112)
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
            pretrained_checkpoint_path=pretrained_encoder_checkpoint_path,
            override_checkpoint_attributes=override_encoder_checkpoint_attributes,
            gradient_checkpointing=gradient_checkpointing,
            scan_blocks=scan_blocks,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

        if pred_head_type == "linear":
            self.info_sharing = MultiViewCrossAttentionTransformer(
                name="base_info_sharing",
                input_embed_dim=self.encoder.enc_embed_dim,
                num_views=2,
                dim=info_sharing_dim,
                depth=info_sharing_depth,
                num_heads=info_sharing_num_heads,
                custom_positional_encoding=self.rope,
                gradient_checkpointing=gradient_checkpointing,
                scan_blocks=scan_blocks,
                pretrained_checkpoint_path=pretrained_info_sharing_checkpoint_path,
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=rngs,
            )
        elif pred_head_type == "dpt":
            if info_sharing_depth < 2:
                raise ValueError("dpt heads need info_sharing_depth >= 2 for distinct hook indices")
            self.info_sharing = MultiViewCrossAttentionTransformerIFR(
                name="base_info_sharing",
                input_embed_dim=self.encoder.enc_embed_dim,
                num_views=2,
                dim=info_sharing_dim,
                depth=info_sharing_depth,
                num_heads=info_sharing_num_heads,
                # reference hardcodes [5, 8] for its always-12-deep decoder
                # (factory/dust3r.py DPT hooks); guard for the size-override
                # extension so shallow test/example decoders stay valid
                # (depth >= 2 asserted above keeps the two indices distinct)
                indices=[5, 8] if info_sharing_depth >= 9 else [0, info_sharing_depth // 2],
                norm_intermediate=False,
                custom_positional_encoding=self.rope,
                gradient_checkpointing=gradient_checkpointing,
                scan_blocks=scan_blocks,
                pretrained_checkpoint_path=pretrained_info_sharing_checkpoint_path,
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=rngs,
            )
        else:
            raise ValueError(f"Invalid prediction head type: {pred_head_type}. Must be 'linear' or 'dpt'.")

        if pred_head_type == "linear":
            self.head1 = LinearFeature(
                input_feature_dim=self.info_sharing.dim,
                output_dim=pred_head_output_dim,
                patch_size=self.encoder.patch_size,
                pretrained_checkpoint_path=pretrained_pred_head_checkpoint_paths[0],
                dtype=head_dtype,
                rngs=rngs,
            )
            self.head2 = LinearFeature(
                input_feature_dim=self.info_sharing.dim,
                output_dim=pred_head_output_dim,
                patch_size=self.encoder.patch_size,
                pretrained_checkpoint_path=pretrained_pred_head_checkpoint_paths[1],
                dtype=head_dtype,
                rngs=rngs,
            )
        else:  # dpt
            from uniception_tpu.models.prediction_heads.dpt import DPTFeature, DPTRegressionProcessor

            self.dpt_feature_head1 = DPTFeature(
                patch_size=self.encoder.patch_size,
                hooks=[0, 1, 2, 3],
                input_feature_dims=[self.encoder.enc_embed_dim] + [self.info_sharing.dim] * 3,
                feature_dim=pred_head_feature_dim,
                pretrained_checkpoint_path=pretrained_pred_head_checkpoint_paths[0],
                checkpoint_gradient=head_remat,
                dtype=head_dtype,
                rngs=rngs,
            )
            self.dpt_regressor_head1 = DPTRegressionProcessor(
                input_feature_dim=pred_head_feature_dim,
                output_dim=pred_head_output_dim,
                pretrained_checkpoint_path=pretrained_pred_head_regressor_checkpoint_paths[0],
                checkpoint_gradient=head_remat,
                dtype=head_dtype,
                rngs=rngs,
            )
            self.dpt_feature_head2 = DPTFeature(
                patch_size=self.encoder.patch_size,
                hooks=[0, 1, 2, 3],
                input_feature_dims=[self.encoder.enc_embed_dim] + [self.info_sharing.dim] * 3,
                feature_dim=pred_head_feature_dim,
                pretrained_checkpoint_path=pretrained_pred_head_checkpoint_paths[1],
                checkpoint_gradient=head_remat,
                dtype=head_dtype,
                rngs=rngs,
            )
            self.dpt_regressor_head2 = DPTRegressionProcessor(
                input_feature_dim=pred_head_feature_dim,
                output_dim=pred_head_output_dim,
                pretrained_checkpoint_path=pretrained_pred_head_regressor_checkpoint_paths[1],
                checkpoint_gradient=head_remat,
                dtype=head_dtype,
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

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained DUSt3R weights from {pretrained_checkpoint_path} ...")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], ignore=self.checkpoint_alias_patterns())

    def checkpoint_alias_patterns(self) -> tuple:
        """Regex patterns for torch-side duplicate keys in full-model state
        dicts. The reference's dpt variant registers the same modules under
        head{1,2} = nn.Sequential(dpt_feature_head, dpt_regressor_head)
        (reference factory/dust3r.py:178,192) plus the scratch.layer*_rn
        spellings — canonical keys are dpt_feature_head*/dpt_regressor_head*.
        For the linear variant head{1,2}.* IS canonical, so nothing is
        ignored."""
        if self.pred_head_type == "dpt":
            from uniception_tpu.models.prediction_heads.dpt import DPT_CHECKPOINT_ALIASES

            return DPT_CHECKPOINT_ALIASES + (r"^head[12]\.",)
        return ()

    # --- head dispatch -----------------------------------------------------

    def _head(self, head_num: int, decout, img_shape):
        if self.pred_head_type == "linear":
            head = self.head1 if head_num == 1 else self.head2
            return head(PredictionHeadInput(last_feature=decout[f"{head_num}"]))
        feature_head = self.dpt_feature_head1 if head_num == 1 else self.dpt_feature_head2
        regressor = self.dpt_regressor_head1 if head_num == 1 else self.dpt_regressor_head2
        feats = feature_head(PredictionHeadLayeredInput(list_features=decout[f"{head_num}"], target_output_shape=img_shape))
        return regressor(feats)

    # --- encoding ----------------------------------------------------------

    def _encode_image_pairs(self, img1, img2, data_norm_type, true_shape1=None, true_shape2=None):
        "Encode both views; same-shape pairs batch through the encoder once (dust3r.py:211-225)."
        if img1.shape[-2:] == img2.shape[-2:]:
            true_shape = None
            if true_shape1 is not None and true_shape2 is not None:
                true_shape = jnp.concatenate([true_shape1, true_shape2], axis=0)
            out = self.encoder(
                ViTEncoderInput(image=jnp.concatenate([img1, img2], axis=0), data_norm_type=data_norm_type, true_shape=true_shape)
            )
            feat1, feat2 = jnp.split(out.features, 2, axis=0)
        else:
            feat1 = self.encoder(ViTEncoderInput(image=img1, data_norm_type=data_norm_type, true_shape=true_shape1)).features
            feat2 = self.encoder(ViTEncoderInput(image=img2, data_norm_type=data_norm_type, true_shape=true_shape2)).features
        return feat1, feat2

    def _encode_symmetrized(self, view1, view2):
        "Dedup symmetrized pairs: encode half the batch, re-interleave (dust3r.py:227-238)."
        img1, img2 = view1["img"], view2["img"]
        ts1, ts2 = view1.get("true_shape"), view2.get("true_shape")
        if is_symmetrized(view1, view2):
            feat1, feat2 = self._encode_image_pairs(
                img1[::2], img2[::2], data_norm_type=view1["data_norm_type"],
                true_shape1=None if ts1 is None else ts1[::2],
                true_shape2=None if ts2 is None else ts2[::2],
            )
            feat1, feat2 = interleave(feat1, feat2)
        else:
            feat1, feat2 = self._encode_image_pairs(
                img1, img2, data_norm_type=view1["data_norm_type"], true_shape1=ts1, true_shape2=ts2
            )
        return feat1, feat2

    # --- forward -----------------------------------------------------------

    def forward_pair(self, img1, img2, true_shape1=None, true_shape2=None):
        """Pure-array two-view forward (jit/pjit-friendly).

        Args:
            img1/img2: (B, 3, H, W) normalized images.
            true_shape1/2: optional (B, 2) actual (h, w) for ManyAR batches.

        Returns:
            (res1, res2) dicts with pts3d(+_in_other_view) and conf in BHWC.
        """
        shape1 = (int(img1.shape[-2]), int(img1.shape[-1]))
        shape2 = (int(img2.shape[-2]), int(img2.shape[-1]))

        feat1, feat2 = self._encode_image_pairs(
            img1, img2, self.data_norm_type, true_shape1=true_shape1, true_shape2=true_shape2
        )
        return self._decode_and_predict(
            feat1, feat2, shape1, shape2, true_shape1=true_shape1, true_shape2=true_shape2
        )

    def _true_positions(self, feat, true_shape):
        """Per-sample token positions for a ManyAR batch: landscape rows use
        the (hp, wp) grid, portrait rows the (wp, hp) grid — the same
        positions the patch embed computed (patch_embed.py ManyAR)."""
        B, _, hp, wp = feat.shape
        pos_land = make_patch_positions(B, hp, wp)
        pos_port = make_patch_positions(B, wp, hp)
        is_land = (true_shape[:, 1] >= true_shape[:, 0])[:, None, None]
        return jnp.where(is_land, pos_land, pos_port)

    def _head_and_adapt(self, head_num, decout, shape):
        head_out = self._head(head_num, decout, shape)
        # adaptor nonlinearities (exp/clip) always in fp32
        return self.adaptor(
            AdaptorInput(adaptor_feature=head_out.decoded_channels.astype(jnp.float32), output_shape_hw=shape)
        )

    def _predict_view(self, head_num, decout, shape, true_shape):
        """Head + adaptor; with ``true_shape`` (landscape_only mode) also run
        the transposed-token-grid pass and where-select portrait rows — the
        static equivalent of vanilla CroCo's transpose_to_landscape."""
        out = self._head_and_adapt(head_num, decout, shape)
        if true_shape is None:
            return out

        def regrid(f):
            # canvas grid -> token order -> transposed grid: portrait rows'
            # tokens were produced in (wp, hp) row-major order, so this
            # recovers their TRUE spatial grid (garbage for landscape rows,
            # which the where-select below discards)
            B, C, hp, wp = f.shape
            return f.reshape(B, C, hp * wp).reshape(B, C, wp, hp)

        out_p = self._head_and_adapt(head_num, jax.tree.map(regrid, decout), shape[::-1])
        is_port = (true_shape[:, 0] > true_shape[:, 1]).reshape(-1, 1, 1, 1)
        return out.replace(
            value=jnp.where(is_port, jnp.swapaxes(out_p.value, -1, -2), out.value),
            confidence=jnp.where(is_port, jnp.swapaxes(out_p.confidence, -1, -2), out.confidence),
        )

    def _decode_and_predict(self, feat1, feat2, shape1, shape2, true_shape1=None, true_shape2=None):
        mixed_ar = (
            self.landscape_only
            and self.patch_embed_cls == "ManyAR_PatchEmbed"
            and true_shape1 is not None
            and true_shape2 is not None
        )
        if mixed_ar:
            info_in = MultiViewTransformerInput(
                features=[feat1, feat2],
                positions=[self._true_positions(feat1, true_shape1), self._true_positions(feat2, true_shape2)],
            )
        else:
            info_in = MultiViewTransformerInput(features=[feat1, feat2])
        # Heads run fp32 by default (reference autocast-off region,
        # dust3r.py:309); head_dtype=bf16 is the opt-in serving knob.
        hd = self.head_dtype or jnp.float32

        if self.pred_head_type == "linear":
            final = self.info_sharing(info_in)
            decout = {
                "1": final.features[0].astype(hd),
                "2": final.features[1].astype(hd),
            }
        else:
            final, intermediate = self.info_sharing(info_in)
            decout = {
                "1": [
                    feat1.astype(hd),
                    intermediate[0].features[0].astype(hd),
                    intermediate[1].features[0].astype(hd),
                    final.features[0].astype(hd),
                ],
                "2": [
                    feat2.astype(hd),
                    intermediate[0].features[1].astype(hd),
                    intermediate[1].features[1].astype(hd),
                    final.features[1].astype(hd),
                ],
            }

        out1 = self._predict_view(1, decout, shape1, true_shape1 if mixed_ar else None)
        out2 = self._predict_view(2, decout, shape2, true_shape2 if mixed_ar else None)

        res1 = {
            "pts3d": jnp.transpose(out1.value, (0, 2, 3, 1)),
            "conf": jnp.transpose(out1.confidence, (0, 2, 3, 1)),
        }
        res2 = {
            "pts3d_in_other_view": jnp.transpose(out2.value, (0, 2, 3, 1)),
            "conf": jnp.transpose(out2.confidence, (0, 2, 3, 1)),
        }
        return res1, res2

    def __call__(self, view1: dict, view2: dict):
        """Reference-compatible forward over view dicts (dust3r.py:250-332).

        view dicts carry "img" (B, 3, H, W), optional "instance" ids for
        symmetrized-batch dedup, "data_norm_type", optional "true_shape".
        """
        shape1 = (int(view1["img"].shape[-2]), int(view1["img"].shape[-1]))
        shape2 = (int(view2["img"].shape[-2]), int(view2["img"].shape[-1]))
        view1 = dict(view1)
        view2 = dict(view2)
        view1.setdefault("data_norm_type", self.data_norm_type)
        view1.setdefault("instance", [str(i) for i in range(view1["img"].shape[0])])
        view2.setdefault("instance", [str(i) for i in range(view2["img"].shape[0])])

        feat1, feat2 = self._encode_symmetrized(view1, view2)
        return self._decode_and_predict(
            feat1, feat2, shape1, shape2,
            true_shape1=view1.get("true_shape"), true_shape2=view2.get("true_shape"),
        )
