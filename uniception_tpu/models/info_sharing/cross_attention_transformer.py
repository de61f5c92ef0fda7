"""
Multi-view cross-attention transformer (DUSt3R-decoder style).

Behavioral parity with reference
uniception/models/info_sharing/cross_attention_transformer.py:22-505:
per-view branches of CrossAttentionBlocks; at each depth every view
cross-attends to the concatenation of all other views' tokens.

TPU-native notes:
    * the per-view branches are independent parameter sets (the reference
      deepcopies one branch per view, :147-150); here each branch is
      constructed from the same rng stream, and the view/depth double loop
      unrolls under jit — XLA overlaps the per-view attention calls.
    * custom positional encoding receives (B, N, H, D) tokens (see nn.blocks).
"""

from typing import Callable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.info_sharing.base import (
    MultiViewTransformerInput,
    MultiViewTransformerOutput,
    UniCeptionInfoSharingBase,
)
from uniception_tpu.models.utils.intermediate_feature_return import (
    IntermediateFeatureReturner,
    feature_take_indices,
)
from uniception_tpu.models.utils.positional_encoding import make_patch_positions
from uniception_tpu.nn.blocks import CrossAttentionBlock, Mlp, layer_norm_factory
from uniception_tpu.nn.common import Identity, LinearX, remat_call
from uniception_tpu.nn.scan import make_stacked_blocks
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["MultiViewCrossAttentionTransformer", "MultiViewCrossAttentionTransformerIFR"]


class MultiViewCrossAttentionTransformer(UniCeptionInfoSharingBase):
    "Multi-view cross-attention transformer for information sharing."

    # class default so subclasses with their own __init__ (e.g. the
    # Differential variant) keep the Python-loop layout unless they opt in
    scan_blocks = False

    def __init__(
        self,
        name: str,
        input_embed_dim: int,
        num_views: int,
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
        custom_positional_encoding: Optional[Callable] = None,
        norm_cross_tokens: bool = True,
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
        self.num_views = num_views
        self.depth = depth
        self.dim = dim
        self.num_heads = num_heads
        self.custom_positional_encoding = custom_positional_encoding
        self.gradient_checkpointing = gradient_checkpointing
        self.pretrained_checkpoint_path = pretrained_checkpoint_path

        if input_embed_dim != dim:
            self.proj_embed = LinearX(input_embed_dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        else:
            self.proj_embed = Identity()

        def make_block(r: nnx.Rngs) -> CrossAttentionBlock:
            return CrossAttentionBlock(
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
                custom_positional_encoding=custom_positional_encoding,
                norm_cross_tokens=norm_cross_tokens,
                use_scalable_softmax=use_scalable_softmax,
                use_entropy_scaling=use_entropy_scaling,
                base_token_count_for_entropy_scaling=base_token_count_for_entropy_scaling,
                entropy_scaling_growth_factor=entropy_scaling_growth_factor,
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=r,
            )

        # scan_blocks: each view's branch becomes ONE block with depth-stacked
        # params; the depth loop runs as lax.scan (trace-once compiles,
        # pipeline-parallel-ready layout — see nn/scan.py).
        self.scan_blocks = scan_blocks
        if scan_blocks:
            self.multi_view_branches = nnx.List(
                [make_stacked_blocks(depth, make_block, rngs) for _ in range(num_views)]
            )
        else:
            self.multi_view_branches = nnx.List(
                [nnx.List([make_block(rngs) for _ in range(depth)]) for _ in range(num_views)]
            )
        self.norm = norm_layer(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained multi-view cross-attention transformer weights from {pretrained_checkpoint_path} ...")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])

    # --- internals -------------------------------------------------------

    def _check_input(self, model_input: MultiViewTransformerInput):
        assert len(model_input.features) == self.num_views, (
            f"Expected {self.num_views} views, got {len(model_input.features)}"
        )
        assert all(f.shape[1] == self.input_embed_dim for f in model_input.features), (
            f"All views must have input dimension {self.input_embed_dim}"
        )
        assert all(f.ndim == 4 for f in model_input.features), "All views must have 4 dimensions (N, C, H, W)"

    def _tokens_and_positions(self, model_input: MultiViewTransformerInput):
        "Per-view BCHW -> (B, N, C) tokens + positions; project to transformer dim."
        feats = model_input.features
        batch_size, _, height, width = feats[0].shape
        tokens = [jnp.transpose(f, (0, 2, 3, 1)).reshape(batch_size, height * width, self.input_embed_dim) for f in feats]
        if self.custom_positional_encoding is not None:
            if model_input.positions is not None:
                # caller-provided true positions (ManyAR mixed-orientation
                # batches — see MultiViewTransformerInput.positions)
                positions = list(model_input.positions)
            else:
                positions = [make_patch_positions(batch_size, height, width) for _ in feats]
        else:
            positions = [None] * self.num_views
        tokens = [self.proj_embed(t) for t in tokens]
        return tokens, positions, (batch_size, height, width)

    def _block_apply(self, blk, x, y, xpos, ypos):
        if self.gradient_checkpointing:
            return remat_call(blk, x, y, xpos, ypos)
        return blk(x, y, xpos, ypos)

    def _depth_step(self, depth_idx, tokens, positions):
        "One depth: every view cross-attends to the concat of the others (:241-264)."
        updated = []
        for view_idx, view_tokens in enumerate(tokens):
            others = [tokens[i] for i in range(self.num_views) if i != view_idx]
            others = jnp.concatenate(others, axis=1)
            vpos = positions[view_idx]
            opos = (
                jnp.concatenate([positions[i] for i in range(self.num_views) if i != view_idx], axis=1)
                if vpos is not None
                else None
            )
            blk = self.multi_view_branches[view_idx][depth_idx]
            updated.append(self._block_apply(blk, view_tokens, others, vpos, opos))
        return updated

    def _to_bchw(self, tokens, batch_size, height, width):
        return jnp.transpose(tokens.reshape(batch_size, height, width, self.dim), (0, 3, 1, 2))

    def _run_scan(self, tokens, positions, collect: bool = False):
        """Depth loop as lax.scan over per-view stacked branch params.

        One scan step advances ALL views one depth (each view cross-attends
        to the others' previous-depth tokens — same lockstep semantics as
        the Python loop / reference :241-264)."""
        splits = [nnx.split(branch) for branch in self.multi_view_branches]
        graphdefs = [g for g, _ in splits]
        states = tuple(s for _, s in splits)
        nv = self.num_views

        def body(carry, depth_states):
            toks = list(carry)
            new = []
            for v in range(nv):
                blk = nnx.merge(graphdefs[v], depth_states[v])
                others = jnp.concatenate([toks[i] for i in range(nv) if i != v], axis=1)
                vpos = positions[v]
                opos = (
                    jnp.concatenate([positions[i] for i in range(nv) if i != v], axis=1)
                    if vpos is not None
                    else None
                )
                new.append(blk(toks[v], others, vpos, opos))
            new = tuple(new)
            return new, (new if collect else None)

        if self.gradient_checkpointing:
            body = jax.checkpoint(body)
        final, ys = jax.lax.scan(body, tuple(tokens), states)
        return list(final), ys

    # --- public forward ---------------------------------------------------

    def __call__(self, model_input: MultiViewTransformerInput) -> MultiViewTransformerOutput:
        self._check_input(model_input)
        tokens, positions, (b, h, w) = self._tokens_and_positions(model_input)

        if self.scan_blocks:
            tokens, _ = self._run_scan(tokens, positions)
        else:
            for depth_idx in range(self.depth):
                tokens = self._depth_step(depth_idx, tokens, positions)

        out = [self._to_bchw(self.norm(t), b, h, w) for t in tokens]
        return MultiViewTransformerOutput(features=out)


class MultiViewCrossAttentionTransformerIFR(MultiViewCrossAttentionTransformer, IntermediateFeatureReturner):
    "Multi-view cross-attention transformer returning intermediate depths (:278-505)."

    def __init__(
        self,
        *args,
        indices: Optional[Union[int, List[int]]] = None,
        norm_intermediate: bool = True,
        intermediates_only: bool = False,
        **kwargs,
    ):
        MultiViewCrossAttentionTransformer.__init__(self, *args, **kwargs)
        IntermediateFeatureReturner.__init__(
            self,
            indices=indices,
            norm_intermediate=norm_intermediate,
            intermediates_only=intermediates_only,
        )

    def __call__(
        self, model_input: MultiViewTransformerInput
    ) -> Union[
        List[MultiViewTransformerOutput],
        Tuple[MultiViewTransformerOutput, List[MultiViewTransformerOutput]],
    ]:
        self._check_input(model_input)
        take_indices, _ = feature_take_indices(self.depth, self.indices)

        tokens, positions, (b, h, w) = self._tokens_and_positions(model_input)

        intermediates = []
        if self.scan_blocks:
            tokens, ys = self._run_scan(tokens, positions, collect=True)
            for depth_idx in take_indices:
                views = [
                    self.norm(ys[v][depth_idx]) if self.norm_intermediate else ys[v][depth_idx]
                    for v in range(self.num_views)
                ]
                intermediates.append(
                    MultiViewTransformerOutput(features=[self._to_bchw(t, b, h, w) for t in views])
                )
        else:
            for depth_idx in range(self.depth):
                tokens = self._depth_step(depth_idx, tokens, positions)
                if depth_idx in take_indices:
                    views = [self.norm(t) if self.norm_intermediate else t for t in tokens]
                    intermediates.append(
                        MultiViewTransformerOutput(features=[self._to_bchw(t, b, h, w) for t in views])
                    )

        if self.intermediates_only:
            return intermediates

        out = MultiViewTransformerOutput(features=[self._to_bchw(self.norm(t), b, h, w) for t in tokens])
        return out, intermediates


if __name__ == "__main__":
    # smoke asserts over 2/3/4 views (reference cross_attention_transformer.py:515-609)
    import numpy as np

    for n_views in (2, 3, 4):
        model = MultiViewCrossAttentionTransformer(
            name="smoke", input_embed_dim=32, num_views=n_views, dim=32, depth=2, num_heads=2, rngs=nnx.Rngs(0)
        )
        feats = [jnp.asarray(np.random.RandomState(v).randn(1, 32, 4, 4).astype(np.float32)) for v in range(n_views)]
        out = model(MultiViewTransformerInput(features=feats))
        assert len(out.features) == n_views and out.features[0].shape == (1, 32, 4, 4)
    print("multi-view cross-attention smoke: OK")
