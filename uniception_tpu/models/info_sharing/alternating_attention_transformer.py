"""
Multi-view alternating-attention transformer (VGGT-style).

Behavioral parity with reference
uniception/models/info_sharing/alternating_attention_transformer.py:22-997:
even depths run global attention over all views' tokens; odd depths reshape
(N, V*T, C) -> (N*V, T, C) for frame-local attention (:396-446). Global
extra tokens only join the global (even) layers; per-view extra tokens join
both. Defaults differ from the global transformer: non-reference-view PE is
off by default.

The frame/global switch is a pure reshape — XLA-friendly with static shapes.
Token prep/split logic is shared with MultiViewGlobalAttentionTransformer.
"""

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput, MultiViewTransformerOutput
from uniception_tpu.models.info_sharing.global_attention_transformer import (
    MultiViewGlobalAttentionTransformer,
)
from uniception_tpu.models.utils.intermediate_feature_return import (
    IntermediateFeatureReturner,
    feature_take_indices,
)

__all__ = [
    "MultiViewAlternatingAttentionTransformer",
    "MultiViewAlternatingAttentionTransformerIFR",
    "reshape_for_frame_attention",
]


def reshape_for_frame_attention(tokens: jnp.ndarray, num_views: int, tokens_per_view: int, dim: int):
    "(N, V*T, C) -> (N*V, T, C) (alternating_attention_transformer.py:404-417)."
    B = tokens.shape[0]
    return tokens.reshape(B * num_views, tokens_per_view, dim)


def reshape_from_frame_attention(tokens: jnp.ndarray, batch_size: int, num_views: int, tokens_per_view: int, dim: int):
    "(N*V, T, C) -> (N, V*T, C)."
    return tokens.reshape(batch_size, num_views * tokens_per_view, dim)


class MultiViewAlternatingAttentionTransformer(MultiViewGlobalAttentionTransformer):
    "Alternating global/frame attention over multi-view tokens."

    def __init__(
        self,
        name: str,
        input_embed_dim: int,
        distinguish_ref_and_non_ref_views: bool = True,
        use_pe_for_non_reference_views: bool = False,  # default differs from global (alternating:31)
        max_num_views_for_pe: int = 1000,
        use_rand_idx_pe_for_non_reference_views: bool = True,
        **kwargs,
    ):
        super().__init__(
            name=name,
            input_embed_dim=input_embed_dim,
            distinguish_ref_and_non_ref_views=distinguish_ref_and_non_ref_views,
            use_pe_for_non_reference_views=use_pe_for_non_reference_views,
            max_num_views_for_pe=max_num_views_for_pe,
            use_rand_idx_pe_for_non_reference_views=use_rand_idx_pe_for_non_reference_views,
            **kwargs,
        )

    def _apply_frame(self, blk, tokens, pos, meta, remat=None):
        "Frame-local attention: split off global extra tokens, fold views into batch."
        B, H, W, num_views, n_tok_per_view, n_extra_per_view, n_global = meta
        n_view_tokens = num_views * n_tok_per_view
        view_part = tokens[:, :n_view_tokens]
        extra_part = tokens[:, n_view_tokens:] if n_global else None

        frame_tokens = reshape_for_frame_attention(view_part, num_views, n_tok_per_view, self.dim)
        frame_pos = None
        if pos is not None:
            frame_pos = pos[:, :n_view_tokens].reshape(B * num_views, n_tok_per_view, 2)
        frame_tokens = self._block_apply(blk, frame_tokens, frame_pos, remat=remat)
        view_part = reshape_from_frame_attention(frame_tokens, B, num_views, n_tok_per_view, self.dim)

        if extra_part is not None:
            return jnp.concatenate([view_part, extra_part], axis=1)
        return view_part

    def _run_depth(self, depth_idx, tokens, pos, meta):
        blk = self.self_attention_blocks[depth_idx]
        if depth_idx % 2 == 0:
            # global attention over all views (+ global extra tokens)
            return self._block_apply(blk, tokens, pos)
        return self._apply_frame(blk, tokens, pos, meta)

    def _run_all(self, tokens, pos, meta, collect: bool = False, take_indices=None):
        """All depths; scan layout pairs one (global, frame) step per scan
        iteration over half-depth-stacked params (requires even depth).

        Loop-layout collect retains only ``take_indices`` depths (dict keyed
        by depth) to keep IFR peak memory at |take_indices| x (B, N, C)."""
        if not self.scan_blocks:
            if collect:
                keep = range(self.depth) if take_indices is None else set(take_indices)
                ys = {}
                for depth_idx in range(self.depth):
                    tokens = self._run_depth(depth_idx, tokens, pos, meta)
                    if depth_idx in keep:
                        ys[depth_idx] = tokens
                return tokens, ys
            for depth_idx in range(self.depth):
                tokens = self._run_depth(depth_idx, tokens, pos, meta)
            return tokens

        import jax

        assert self.depth % 2 == 0, "scan_blocks alternating attention requires even depth"
        graphdef, state = nnx.split(self.self_attention_blocks)
        even = jax.tree.map(lambda a: a[0::2], state)
        odd = jax.tree.map(lambda a: a[1::2], state)

        def body(c, xs):
            # remat=False: the single jax.checkpoint(body) wrapper below is
            # the checkpoint boundary — letting _block_apply remat again
            # would nest remat twice per (global, frame) pair
            even_state, odd_state = xs
            c1 = self._block_apply(nnx.merge(graphdef, even_state), c, pos, remat=False)
            c2 = self._apply_frame(nnx.merge(graphdef, odd_state), c1, pos, meta, remat=False)
            return c2, ((c1, c2) if collect else None)

        if self.gradient_checkpointing:
            body = jax.checkpoint(body)
        final, ys = jax.lax.scan(body, tokens, (even, odd))
        if collect:
            # interleave (after-global, after-frame) back into depth order
            y_even, y_odd = ys
            per_depth = []
            for i in range(self.depth // 2):
                per_depth.extend([y_even[i], y_odd[i]])
            return final, per_depth
        return final

    def __call__(self, model_input: MultiViewTransformerInput, rng_key=None) -> MultiViewTransformerOutput:
        tokens, pos, meta = self._prepare_tokens(model_input, rng_key)
        tokens = self._run_all(tokens, pos, meta)
        return self._split_output(self.norm(tokens), meta)


class MultiViewAlternatingAttentionTransformerIFR(MultiViewAlternatingAttentionTransformer, IntermediateFeatureReturner):
    "Alternating-attention transformer returning intermediate depths (:502-997)."

    def __init__(
        self,
        *args,
        indices: Optional[Union[int, List[int]]] = None,
        norm_intermediate: bool = True,
        intermediates_only: bool = False,
        **kwargs,
    ):
        MultiViewAlternatingAttentionTransformer.__init__(self, *args, **kwargs)
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

        tokens, per_depth = self._run_all(tokens, pos, meta, collect=True, take_indices=take_indices)
        intermediates = []
        for depth_idx in take_indices:
            t = self.norm(per_depth[depth_idx]) if self.norm_intermediate else per_depth[depth_idx]
            intermediates.append(self._split_output(t, meta))

        if self.intermediates_only:
            return intermediates
        return self._split_output(self.norm(tokens), meta), intermediates


if __name__ == "__main__":
    # frame-reshape unit check (reference alternating_attention_transformer.py:998-...)
    import numpy as np

    B, V, T, C = 2, 3, 5, 8
    x = jnp.asarray(np.random.RandomState(0).randn(B, V * T, C).astype(np.float32))
    framed = reshape_for_frame_attention(x, V, T, C)
    assert framed.shape == (B * V, T, C)
    back = reshape_from_frame_attention(framed, B, V, T, C)
    assert np.allclose(np.asarray(back), np.asarray(x))
    print("alternating-attention frame reshape smoke: OK")
