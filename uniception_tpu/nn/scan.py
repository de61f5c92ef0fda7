"""
Scan-over-stacked-blocks: compile-time-friendly deep transformer trunks.

The reference's hot loops are Python ``for`` loops over per-depth blocks
(reference: uniception/models/encoders/croco.py:147-182,
info_sharing/cross_attention_transformer.py:241-264). Tracing a ViT-L jit
therefore unrolls 24 (+2x12) structurally identical blocks — slow compiles
and no pipeline-parallel structure. The TPU-native fix (SURVEY.md §7) is to
store ONE block module whose parameters carry a leading depth axis and run
``jax.lax.scan`` over that axis: the block traces once, compile time stops
scaling with depth, and the stacked layout is exactly what pipeline
parallelism needs (shard the depth axis over a mesh 'stage' axis).

Components:
    * :func:`make_stacked_blocks` — build a depth-stacked block via nnx.vmap
      over the constructor (each depth gets its own rng fold).
    * :func:`stacked_state_from_list` — stack the states of an existing
      nnx.List of blocks (loop-layout -> scan-layout conversion).
    * :func:`scan_blocks` — run the scan, optionally collecting every
      depth's output (for intermediate-feature returners) and optionally
      rematerializing each step (gradient checkpointing).

Checkpoint compatibility: utils/torch_compat.py recognizes modules created
here via the ``stacked_depth`` marker and maps torch keys
``prefix.{i}.rest`` <-> the stacked leaf's index ``i`` along axis 0, so
reference .pth checkpoints load into either layout unchanged.

Not stackable: the Differential attention family — its per-depth
``lambda_init_fn(depth)`` is a STATIC float on the module (matching the
reference's per-layer constant), so the per-depth graphdefs differ and
nnx.vmap cannot stack them; those transformers keep the Python-loop layout.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["make_stacked_blocks", "stacked_state_from_list", "scan_blocks", "unstack_block"]


def make_stacked_blocks(depth: int, make_block: Callable[[nnx.Rngs], nnx.Module], rngs: nnx.Rngs) -> nnx.Module:
    """Construct ``depth`` blocks as ONE module with depth-stacked params.

    ``make_block(rngs)`` must build a single block; it is vmapped over
    ``depth`` independent rng folds, so per-depth initializations are
    independent (statistically matching a Python-loop construction).
    """

    @nnx.split_rngs(splits=depth)
    @nnx.vmap(in_axes=(0,), out_axes=0)
    def create(r: nnx.Rngs):
        return make_block(r)

    blocks = create(rngs)
    blocks.stacked_depth = depth
    return blocks


def stacked_state_from_list(blocks) -> nnx.State:
    "Stack the states of a list of identical modules along a new axis 0."
    states = [nnx.state(b) for b in blocks]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_block(stacked: nnx.Module, index: int) -> nnx.Module:
    "Materialize the single block at ``index`` from a stacked module."
    graphdef, state = nnx.split(stacked)
    one = jax.tree.map(lambda x: x[index], state)
    blk = nnx.merge(graphdef, one)
    if hasattr(blk, "stacked_depth"):
        del blk.stacked_depth
    return blk


def scan_blocks(
    stacked: nnx.Module,
    carry,
    *broadcast_args,
    collect: bool = False,
    remat: bool = False,
    remat_policy=None,
):
    """Run ``carry = block_i(carry, *broadcast_args)`` for each depth i.

    collect: also return the per-depth outputs stacked on axis 0
        (depth, ...) — the scan-layout intermediate-feature mechanism.
    remat: jax.checkpoint each step (gradient checkpointing; one block's
        activations instead of the whole trunk).
    """
    graphdef, state = nnx.split(stacked)

    def body(c, block_state):
        blk = nnx.merge(graphdef, block_state)
        out = blk(c, *broadcast_args)
        return out, (out if collect else None)

    if remat:
        body = jax.checkpoint(body, policy=remat_policy)
    final, ys = jax.lax.scan(body, carry, state)
    return (final, ys) if collect else final
