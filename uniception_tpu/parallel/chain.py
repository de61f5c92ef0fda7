"""
Heterogeneous-stage chain pipelining: encoder -> info-sharing -> heads on
DIFFERENT devices, with microbatches streaming through.

`parallel/pipeline.py` pipelines a HOMOGENEOUS depth-stacked trunk inside
one shard_map (GPipe: every stage runs the same block program). What it
cannot express — flagged in the round-2 review — is partitioning the
model CHAIN itself, whose stages are different programs with different
parameter trees and activation shapes (reference call stack:
uniception/models/factory/dust3r.py:250-332 — encoder, multi-view
cross-attention, heads).

The TPU-native mechanism here is placement-driven dispatch, not a
collective schedule: each stage's parameters are committed to its own
device, each stage is an independently jitted program (jit executes on
the device its committed arguments live on), and the boundary
activations move with `jax.device_put` — a device-to-device ICI copy
dispatched asynchronously. The host only enqueues: with JAX's async
dispatch, microbatch m executes on stage s while microbatch m+1 executes
on stage s-1, so a steady stream keeps every stage busy and throughput
approaches 1 / max(stage_time) — GPipe overlap with zero custom
collectives and no padding of heterogeneous activations into a common
shape. Per-device HBM holds only that stage's parameters (the memory
win that lets a model larger than one chip serve as a chain).

Usage (generic):

    stages = [(fn_a, module_a), (fn_b, module_b)]   # fn(state, *xs) -> ys
    pipe = ChainPipeline(stages, devices=jax.devices()[:2])
    outs = pipe.run(stream_of_input_tuples)

Usage (DUSt3R):

    pipe = ChainPipeline(dust3r_chain_stages(model), devices=jax.devices()[:3])
    res1, res2 = pipe((img1, img2))        # == model.forward_pair(img1, img2)
"""

from typing import Callable, List, Optional, Sequence, Tuple

import jax
from flax import nnx

__all__ = ["ChainPipeline", "dust3r_chain_stages", "dust3r_chain_results"]


class ChainPipeline:
    """Run `stages` as a device-per-stage pipeline.

    stages: list of ``(fn, module)`` — ``fn(state, *arrays) -> array |
        tuple`` is the stage program; ``module`` is the nnx.Module whose
        (split) state is the stage's parameters. Stage i's output tuple
        feeds stage i+1's ``*arrays``.
    devices: one device per stage (defaults to the first len(stages)
        ambient devices; with fewer devices than stages, stages wrap
        round-robin — still correct, less overlap).
    """

    def __init__(self, stages: Sequence[Tuple[Callable, nnx.Module]], devices: Optional[Sequence] = None):
        if devices is None:
            devices = jax.devices()
        self.devices = [devices[i % len(devices)] for i in range(len(stages))]
        self._fns = []
        self._states = []
        for (fn, module), dev in zip(stages, self.devices):
            _, state = nnx.split(module)
            self._states.append(jax.device_put(state, dev))
            self._fns.append(jax.jit(fn))

    def __call__(self, xs):
        "One microbatch through all stages. xs: array or tuple of arrays."
        if not isinstance(xs, tuple):
            xs = (xs,)
        for fn, state, dev in zip(self._fns, self._states, self.devices):
            xs = jax.device_put(xs, dev)
            ys = fn(state, *xs)
            xs = ys if isinstance(ys, tuple) else (ys,)
        return xs if len(xs) > 1 else xs[0]

    def run(self, stream) -> List:
        """Stream microbatches through the chain.

        All calls are enqueued without blocking (JAX async dispatch), so
        stage s works on microbatch m while stage s-1 works on m+1; the
        returned list is in input order. Block on the results (e.g.
        ``jax.block_until_ready``) when consuming.
        """
        return [self(xs) for xs in stream]


def dust3r_chain_stages(model) -> List[Tuple[Callable, nnx.Module]]:
    """Split a ``DUSt3R`` into three chain stages: encoder ->
    info-sharing -> heads+adaptor (the reference's forward chain,
    factory/dust3r.py:250-332). Math is identical to
    ``model.forward_pair`` — only the placement schedule differs.

    Returns stages for :class:`ChainPipeline`; pipeline input is
    ``(img1, img2)`` with both views the same (static) size, output is
    the usual ``(res1, res2)`` dicts.
    """
    from uniception_tpu.models.factory.dust3r import DUSt3R  # noqa: F401 (doc link)
    from uniception_tpu.models.encoders.base import ViTEncoderInput
    from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput

    import jax.numpy as jnp

    if getattr(model, "landscape_only", False):
        raise NotImplementedError(
            "dust3r_chain_stages does not implement the landscape_only "
            "dual-pass head path; portrait rows of a mixed ManyAR batch "
            "would come out canvas-scrambled. Use model.forward_pair, or "
            "construct with landscape_only=False for homogeneous batches."
        )
    data_norm_type = model.data_norm_type
    pred_head_type = model.pred_head_type
    hd = model.head_dtype or jnp.float32

    # --- stage 0: shared encoder over both views ---------------------------
    enc_graphdef, _ = nnx.split(model.encoder)

    def encode(state, img1, img2):
        enc = nnx.merge(enc_graphdef, state)
        out = enc(
            ViTEncoderInput(
                image=jnp.concatenate([img1, img2], axis=0), data_norm_type=data_norm_type
            )
        )
        feat1, feat2 = jnp.split(out.features, 2, axis=0)
        return feat1, feat2

    # --- stage 1: multi-view info sharing -----------------------------------
    is_graphdef, _ = nnx.split(model.info_sharing)

    def share(state, feat1, feat2):
        info = nnx.merge(is_graphdef, state)
        info_in = MultiViewTransformerInput(features=[feat1, feat2])
        if pred_head_type == "linear":
            final = info(info_in)
            return (
                final.features[0].astype(hd),
                final.features[1].astype(hd),
            )
        final, intermediate = info(info_in)
        return (
            feat1.astype(hd),
            feat2.astype(hd),
            intermediate[0].features[0].astype(hd),
            intermediate[0].features[1].astype(hd),
            intermediate[1].features[0].astype(hd),
            intermediate[1].features[1].astype(hd),
            final.features[0].astype(hd),
            final.features[1].astype(hd),
        )

    # --- stage 2: heads + adaptor -------------------------------------------
    class _Heads(nnx.Module):
        "View of the model's head/adaptor submodules (shared references)."

        def __init__(self, m):
            if m.pred_head_type == "linear":
                self.head1, self.head2 = m.head1, m.head2
            else:
                self.dpt_feature_head1 = m.dpt_feature_head1
                self.dpt_regressor_head1 = m.dpt_regressor_head1
                self.dpt_feature_head2 = m.dpt_feature_head2
                self.dpt_regressor_head2 = m.dpt_regressor_head2
            self.adaptor = m.adaptor

    heads = _Heads(model)
    heads_graphdef, _ = nnx.split(heads)
    shape = (int(model.img_size[0]), int(model.img_size[1]))

    from uniception_tpu.models.prediction_heads.base import (
        AdaptorInput,
        PredictionHeadInput,
        PredictionHeadLayeredInput,
    )

    def predict(state, *feats):
        h = nnx.merge(heads_graphdef, state)
        if pred_head_type == "linear":
            f1, f2 = feats
            out1 = h.head1(PredictionHeadInput(last_feature=f1))
            out2 = h.head2(PredictionHeadInput(last_feature=f2))
        else:
            feat1, feat2, i0f1, i0f2, i1f1, i1f2, fin1, fin2 = feats
            d1 = [feat1, i0f1, i1f1, fin1]
            d2 = [feat2, i0f2, i1f2, fin2]
            out1 = h.dpt_regressor_head1(
                h.dpt_feature_head1(PredictionHeadLayeredInput(list_features=d1, target_output_shape=shape))
            )
            out2 = h.dpt_regressor_head2(
                h.dpt_feature_head2(PredictionHeadLayeredInput(list_features=d2, target_output_shape=shape))
            )
        a1 = h.adaptor(AdaptorInput(adaptor_feature=out1.decoded_channels.astype(jnp.float32), output_shape_hw=shape))
        a2 = h.adaptor(AdaptorInput(adaptor_feature=out2.decoded_channels.astype(jnp.float32), output_shape_hw=shape))
        return (
            jnp.transpose(a1.value, (0, 2, 3, 1)),
            jnp.transpose(a1.confidence, (0, 2, 3, 1)),
            jnp.transpose(a2.value, (0, 2, 3, 1)),
            jnp.transpose(a2.confidence, (0, 2, 3, 1)),
        )

    return [(encode, model.encoder), (share, model.info_sharing), (predict, heads)]


def dust3r_chain_results(outs):
    "Convert a DUSt3R chain output tuple into the (res1, res2) dicts."
    pts1, conf1, pts2, conf2 = outs
    return (
        {"pts3d": pts1, "conf": conf1},
        {"pts3d_in_other_view": pts2, "conf": conf2},
    )
