"""
Global-attention info-sharing transformers.

Behavioral parity with reference
uniception/models/info_sharing/global_attention_transformer.py:25-1205:

* MultiViewGlobalAttentionTransformer (+IFR): single token stream =
  concat of all views' tokens (+ optional per-view extra tokens and global
  extra tokens); reference-view vs non-reference-view sinusoid view-index
  PE with optional random index sampling for view-count generalization.
* GlobalAttentionTransformer: the multi-set variant where each set may
  have a different token count (:901-1205), with set-index PE.

TPU-native notes:
    * random view/set-index PE requires an explicit `rng_key` argument to
      __call__ — a deliberate API difference from the reference, which calls
      torch.randint internally (global_attention_transformer.py:371-373);
      with rng_key=None sequential indices are used (the deterministic mode).
    * global attention over V*T tokens is exactly where the Pallas flash
      attention kernel pays off (the (V*T)^2 score matrix never hits HBM).
"""

from typing import Callable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.encoders.pe_utils import sinusoid_encoding_table
from uniception_tpu.models.info_sharing.base import (
    MultiSetTransformerInput,
    MultiSetTransformerOutput,
    MultiViewTransformerInput,
    MultiViewTransformerOutput,
    UniCeptionInfoSharingBase,
)
from uniception_tpu.models.utils.intermediate_feature_return import (
    IntermediateFeatureReturner,
    feature_take_indices,
)
from uniception_tpu.models.utils.positional_encoding import make_patch_positions
from uniception_tpu.nn.blocks import Mlp, SelfAttentionBlock, layer_norm_factory
from uniception_tpu.nn.common import Identity, LinearX, remat_call
from uniception_tpu.nn.scan import make_stacked_blocks, scan_blocks as scan_apply
from uniception_tpu.ops.rope import Rope2D
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = [
    "MultiViewGlobalAttentionTransformer",
    "MultiViewGlobalAttentionTransformerIFR",
    "GlobalAttentionTransformer",
]


class _GlobalAttentionBase(UniCeptionInfoSharingBase):
    "Shared ctor for the global-attention transformers."

    def __init__(
        self,
        name: str,
        input_embed_dim: int,
        size: Optional[str] = None,
        depth: int = 12,
        dim: int = 768,
        num_heads: int = 12,
        mlp_ratio: float = 4.0,
        qkv_bias: bool = True,
        qk_norm: bool = False,
        proj_drop: float = 0.0,
        attn_drop: float = 0.0,
        init_values: Optional[float] = None,
        drop_path: float = 0.0,
        act_layer: Optional[Callable] = None,
        norm_layer: Optional[Callable] = None,
        mlp_layer=Mlp,
        custom_positional_encoding: Optional[Union[str, Callable]] = None,
        use_scalable_softmax: bool = False,
        use_entropy_scaling: bool = False,
        base_token_count_for_entropy_scaling: int = 444,
        entropy_scaling_growth_factor: float = 1.4,
        pretrained_checkpoint_path: Optional[str] = None,
        gradient_checkpointing: bool = False,
        scan_blocks: bool = False,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        super().__init__(name=name, size=size)
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        norm_layer = norm_layer or layer_norm_factory(eps=1e-6)

        self.input_embed_dim = input_embed_dim
        self.depth = depth
        self.dim = dim
        self.num_heads = num_heads
        self.gradient_checkpointing = gradient_checkpointing
        self.pretrained_checkpoint_path = pretrained_checkpoint_path

        if input_embed_dim != dim:
            self.proj_embed = LinearX(input_embed_dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        else:
            self.proj_embed = Identity()

        # string-configured "rope" (global_attention_transformer.py:129-134)
        if custom_positional_encoding is not None and isinstance(custom_positional_encoding, str):
            if custom_positional_encoding == "rope":
                self.rope = Rope2D(freq=100.0, F0=1.0)
                custom_positional_encoding = self.rope
            else:
                raise ValueError(f"Unknown custom positional encoding: {custom_positional_encoding}")
        self.custom_positional_encoding = custom_positional_encoding

        def make_block(r: nnx.Rngs) -> SelfAttentionBlock:
            return SelfAttentionBlock(
                dim=dim,
                num_heads=num_heads,
                mlp_ratio=mlp_ratio,
                qkv_bias=qkv_bias,
                qk_norm=qk_norm,
                proj_drop=proj_drop,
                attn_drop=attn_drop,
                init_values=init_values,
                drop_path=drop_path,
                norm_layer=norm_layer,
                mlp_layer=mlp_layer,
                custom_positional_encoding=self.custom_positional_encoding,
                use_scalable_softmax=use_scalable_softmax,
                use_entropy_scaling=use_entropy_scaling,
                base_token_count_for_entropy_scaling=base_token_count_for_entropy_scaling,
                entropy_scaling_growth_factor=entropy_scaling_growth_factor,
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=r,
            )

        # scan_blocks: one depth-stacked block + lax.scan (nn/scan.py)
        self.scan_blocks = scan_blocks
        if scan_blocks:
            self.self_attention_blocks = make_stacked_blocks(depth, make_block, rngs)
        else:
            self.self_attention_blocks = nnx.List([make_block(rngs) for _ in range(depth)])
        self.norm = norm_layer(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def _load_pretrained(self):
        if self.pretrained_checkpoint_path is not None:
            print(f"Loading pretrained global-attention transformer weights from {self.pretrained_checkpoint_path} ...")
            ckpt = load_checkpoint(self.pretrained_checkpoint_path)
            state = {k: v for k, v in ckpt["model"].items() if "pos_table" not in k}
            load_torch_state_dict(self, state)

    def _block_apply(self, blk, x, pos, remat=None):
        "remat overrides self.gradient_checkpointing (e.g. False inside an already-rematted scan body)."
        remat = self.gradient_checkpointing if remat is None else remat
        if remat:
            return remat_call(blk, x, pos)
        return blk(x, pos)

    def _run_blocks(self, tokens, pos, collect: bool = False, take_indices=None):
        """Run the depth loop in whichever layout this instance stores (loop/scan).

        With collect=True the scan layout returns a (depth, ...) stacked array
        (inherent to lax.scan); the loop layout returns a {depth_idx: tokens}
        dict retaining only ``take_indices`` (all depths when None) so IFR
        peak activation memory stays |take_indices| x (B, N, C), not depth x.
        """
        if self.scan_blocks:
            return scan_apply(
                self.self_attention_blocks, tokens, pos,
                collect=collect, remat=self.gradient_checkpointing,
            )
        if collect:
            keep = range(len(self.self_attention_blocks)) if take_indices is None else set(take_indices)
            ys = {}
            for depth_idx, blk in enumerate(self.self_attention_blocks):
                tokens = self._block_apply(blk, tokens, pos)
                if depth_idx in keep:
                    ys[depth_idx] = tokens
            return tokens, ys
        for blk in self.self_attention_blocks:
            tokens = self._block_apply(blk, tokens, pos)
        return tokens


class MultiViewGlobalAttentionTransformer(_GlobalAttentionBase):
    "Multi-view global-attention transformer (VGGT-style single stream)."

    def __init__(
        self,
        name: str,
        input_embed_dim: int,
        distinguish_ref_and_non_ref_views: bool = True,
        use_pe_for_non_reference_views: bool = True,
        max_num_views_for_pe: int = 1000,
        use_rand_idx_pe_for_non_reference_views: bool = True,
        **kwargs,
    ):
        super().__init__(name=name, input_embed_dim=input_embed_dim, **kwargs)
        self.distinguish_ref_and_non_ref_views = distinguish_ref_and_non_ref_views
        self.use_pe_for_non_reference_views = use_pe_for_non_reference_views
        self.max_num_views_for_pe = max_num_views_for_pe
        self.use_rand_idx_pe_for_non_reference_views = use_rand_idx_pe_for_non_reference_views

        if distinguish_ref_and_non_ref_views:
            n = max_num_views_for_pe if use_pe_for_non_reference_views else 1
            # deterministic sinusoid buffer: recomputed, not loaded
            self.view_pos_table = jnp.asarray(sinusoid_encoding_table(n, self.dim, 10000.0))
        self._load_pretrained()

    # --- helpers -----------------------------------------------------------

    def _nonref_pe_indices(self, num_views: int, rng_key):
        if self.use_rand_idx_pe_for_non_reference_views and rng_key is not None:
            return jax.random.randint(rng_key, (num_views - 1,), 1, self.max_num_views_for_pe)
        return jnp.arange(1, num_views)

    def _prepare_tokens(self, model_input: MultiViewTransformerInput, rng_key):
        feats = model_input.features
        num_views = len(feats)
        assert num_views <= self.max_num_views_for_pe
        assert all(f.shape[1] == self.input_embed_dim for f in feats)
        assert all(f.ndim == 4 for f in feats)

        B, _, H, W = feats[0].shape
        n_extra_per_view = 0

        view_tokens = [jnp.transpose(f, (0, 2, 3, 1)).reshape(B, H * W, self.input_embed_dim) for f in feats]

        if model_input.additional_input_tokens_per_view is not None:
            extra_pv = model_input.additional_input_tokens_per_view
            assert len(extra_pv) == num_views
            n_extra_per_view = extra_pv[0].shape[2]
            view_tokens = [
                jnp.concatenate([vt, jnp.transpose(t, (0, 2, 1))], axis=1) for vt, t in zip(view_tokens, extra_pv)
            ]

        tokens = jnp.concatenate(view_tokens, axis=1)  # (B, V*(HW+T), C)
        n_tok_per_view = H * W + n_extra_per_view

        n_global = 0
        if model_input.additional_input_tokens is not None:
            extra = jnp.transpose(model_input.additional_input_tokens, (0, 2, 1))
            n_global = extra.shape[1]
            tokens = jnp.concatenate([tokens, extra], axis=1)

        tokens = self.proj_embed(tokens)

        if self.custom_positional_encoding is not None:
            if n_extra_per_view or n_global:
                raise ValueError(
                    "Custom positional encoding is not supported when additional tokens are provided."
                )
            if model_input.positions is not None:
                # caller-provided true per-view positions (ManyAR mixed-
                # orientation batches — see MultiViewTransformerInput.positions)
                pos = jnp.concatenate(list(model_input.positions), axis=1)
            else:
                pos = jnp.concatenate([make_patch_positions(B, H, W)] * num_views, axis=1)
        else:
            pos = None

        # view-index PE
        if self.distinguish_ref_and_non_ref_views:
            ref = tokens[:, :n_tok_per_view] + self.view_pos_table[0].astype(tokens.dtype)
            if self.use_pe_for_non_reference_views and num_views > 1:
                idx = self._nonref_pe_indices(num_views, rng_key)
                pe = self.view_pos_table[idx].astype(tokens.dtype)  # (V-1, C)
                pe = jnp.repeat(pe, n_tok_per_view, axis=0)[None]  # (1, (V-1)*T, C)
                nonref = tokens[:, n_tok_per_view : num_views * n_tok_per_view] + pe
            else:
                nonref = tokens[:, n_tok_per_view : num_views * n_tok_per_view]
            rest = tokens[:, num_views * n_tok_per_view :]
            tokens = jnp.concatenate([ref, nonref, rest], axis=1)

        return tokens, pos, (B, H, W, num_views, n_tok_per_view, n_extra_per_view, n_global)

    def _split_output(self, tokens, meta):
        B, H, W, num_views, n_tok_per_view, n_extra_per_view, n_global = meta
        view_flat = tokens[:, : num_views * n_tok_per_view]
        spatial = H * W

        view_tokens = view_flat.reshape(B, num_views, n_tok_per_view, self.dim)
        spatial_tokens = view_tokens[:, :, :spatial]
        features = [
            jnp.transpose(spatial_tokens[:, v].reshape(B, H, W, self.dim), (0, 3, 1, 2)) for v in range(num_views)
        ]

        extra_per_view = None
        if n_extra_per_view:
            extra_per_view = [
                jnp.transpose(view_tokens[:, v, spatial:], (0, 2, 1)) for v in range(num_views)
            ]

        extra_global = None
        if n_global:
            extra_global = jnp.transpose(tokens[:, num_views * n_tok_per_view :], (0, 2, 1))

        return MultiViewTransformerOutput(
            features=features,
            additional_token_features=extra_global,
            additional_token_features_per_view=extra_per_view,
        )

    def __call__(self, model_input: MultiViewTransformerInput, rng_key=None) -> MultiViewTransformerOutput:
        tokens, pos, meta = self._prepare_tokens(model_input, rng_key)
        tokens = self._run_blocks(tokens, pos)
        return self._split_output(self.norm(tokens), meta)


class MultiViewGlobalAttentionTransformerIFR(MultiViewGlobalAttentionTransformer, IntermediateFeatureReturner):
    "Global-attention transformer returning intermediate depths (:463-...)."

    def __init__(
        self,
        *args,
        indices: Optional[Union[int, List[int]]] = None,
        norm_intermediate: bool = True,
        intermediates_only: bool = False,
        **kwargs,
    ):
        MultiViewGlobalAttentionTransformer.__init__(self, *args, **kwargs)
        IntermediateFeatureReturner.__init__(
            self, indices=indices, norm_intermediate=norm_intermediate, intermediates_only=intermediates_only
        )

    def __call__(
        self, model_input: MultiViewTransformerInput, rng_key=None
    ) -> Union[
        List[MultiViewTransformerOutput],
        Tuple[MultiViewTransformerOutput, List[MultiViewTransformerOutput]],
    ]:
        take_indices, _ = feature_take_indices(self.depth, self.indices)
        tokens, pos, meta = self._prepare_tokens(model_input, rng_key)

        tokens, per_depth = self._run_blocks(tokens, pos, collect=True, take_indices=take_indices)
        intermediates = []
        for depth_idx in take_indices:
            t = self.norm(per_depth[depth_idx]) if self.norm_intermediate else per_depth[depth_idx]
            intermediates.append(self._split_output(t, meta))

        if self.intermediates_only:
            return intermediates
        return self._split_output(self.norm(tokens), meta), intermediates


class GlobalAttentionTransformer(_GlobalAttentionBase):
    "Multi-set global-attention transformer (different token counts per set)."

    def __init__(
        self,
        name: str,
        input_embed_dim: int,
        max_num_sets: int,
        use_rand_idx_pe_for_non_reference_sets: bool,
        **kwargs,
    ):
        super().__init__(name=name, input_embed_dim=input_embed_dim, **kwargs)
        self.max_num_sets = max_num_sets
        self.use_rand_idx_pe_for_non_reference_sets = use_rand_idx_pe_for_non_reference_sets
        self.set_pos_table = jnp.asarray(sinusoid_encoding_table(max_num_sets, self.dim, 10000.0))
        self._load_pretrained()

    def __call__(self, model_input: MultiSetTransformerInput, rng_key=None) -> MultiSetTransformerOutput:
        feats = model_input.features
        num_sets = len(feats)
        assert num_sets <= self.max_num_sets
        assert all(f.shape[1] == self.input_embed_dim for f in feats)
        assert all(f.ndim == 3 for f in feats)

        B = feats[0].shape[0]
        tokens_per_set = [f.shape[2] for f in feats]
        tokens = jnp.concatenate([jnp.transpose(f, (0, 2, 1)) for f in feats], axis=1)

        n_global = 0
        if model_input.additional_input_tokens is not None:
            extra = jnp.transpose(model_input.additional_input_tokens, (0, 2, 1))
            n_global = extra.shape[1]
            tokens = jnp.concatenate([tokens, extra], axis=1)

        tokens = self.proj_embed(tokens)

        # set-index PE: ref set 0 + sequential/random indices for the rest
        if self.use_rand_idx_pe_for_non_reference_sets and rng_key is not None:
            idx = jax.random.randint(rng_key, (num_sets - 1,), 1, self.max_num_sets)
        else:
            idx = jnp.arange(1, num_sets)
        pe_parts = [jnp.broadcast_to(self.set_pos_table[0], (tokens_per_set[0], self.dim))]
        for s in range(1, num_sets):
            pe_parts.append(jnp.broadcast_to(self.set_pos_table[idx[s - 1]], (tokens_per_set[s], self.dim)))
        pe = jnp.concatenate(pe_parts, axis=0)[None].astype(tokens.dtype)
        n_set_tokens = sum(tokens_per_set)
        tokens = jnp.concatenate([tokens[:, :n_set_tokens] + pe, tokens[:, n_set_tokens:]], axis=1)

        for blk in self.self_attention_blocks:
            tokens = self._block_apply(blk, tokens, None)
        tokens = self.norm(tokens)

        extra_out = None
        if n_global:
            extra_out = jnp.transpose(tokens[:, n_set_tokens:], (0, 2, 1))
            tokens = tokens[:, :n_set_tokens]

        out = jnp.transpose(tokens, (0, 2, 1))  # (B, C, T)
        offsets = [0]
        for t in tokens_per_set:
            offsets.append(offsets[-1] + t)
        features = [out[:, :, offsets[i] : offsets[i + 1]] for i in range(num_sets)]

        return MultiSetTransformerOutput(features=features, additional_token_features=extra_out)
