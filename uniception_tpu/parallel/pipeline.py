"""
Pipeline parallelism (GPipe-style) over depth-stacked transformer blocks.

The reference has no pipeline parallelism (SURVEY.md §2.8); this is the
TPU-native extension the scan-over-stacked-blocks layout (nn/scan.py) was
built to enable: the stacked depth axis is sharded over a mesh "stage"
axis, each stage runs its contiguous slab of blocks, and boundary
activations travel stage-to-stage over ICI via ``jax.lax.ppermute`` while
microbatches keep every stage busy (bubble fraction (S-1)/(M+S-1)).

Everything runs inside one ``jax.shard_map`` — XLA sees a static schedule
of per-stage compute + point-to-point collectives, exactly the
scaling-book pipeline recipe.

Usage:
    mesh = Mesh(devices, ("stage",))
    out = pipeline_blocks(stacked_blocks, x, pos, mesh=mesh,
                          num_microbatches=4)
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["pipeline_blocks", "shard_stacked_state"]


def shard_stacked_state(
    stacked: nnx.Module, mesh: Mesh, stage_axis: str = "stage", model_axis: Optional[str] = None
) -> None:
    """Device-put the stacked block params sharded along depth over the
    stage axis (in place). Each stage then holds depth/S blocks in HBM —
    the memory win that makes PP worth it for models deeper than a chip.

    model_axis: also apply the TP_RULES tensor-parallel specs within each
        stage (pp x tp): a qkv kernel (depth, in, out) lands as
        P(stage, None, model). Must be named "model" (the axis name the
        TP_RULES PartitionSpecs carry)."""
    from uniception_tpu.utils.pytree import keypath_str

    if model_axis is not None:
        assert model_axis == "model", "TP_RULES specs name the axis 'model'"
        from uniception_tpu.parallel.mesh import leaf_tp_spec

    state = nnx.state(stacked)
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    leaves = []
    for keypath, leaf in flat:
        spec = P(stage_axis)
        if model_axis is not None:
            tp = leaf_tp_spec(keypath_str(keypath), leaf, mesh)
            if len(tp) > 0:  # stacked leaves: leading depth axis -> stage
                spec = P(stage_axis, *tp[1:])
        leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    nnx.update(stacked, jax.tree_util.tree_unflatten(treedef, leaves))


def pipeline_blocks(
    stacked: nnx.Module,
    x: jnp.ndarray,
    *broadcast_args,
    mesh: Mesh,
    stage_axis: str = "stage",
    data_axis: Optional[str] = None,
    model_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
):
    """Run depth-stacked blocks (nn/scan.py layout) as a GPipe pipeline.

    x: (B, ...) activations; B must divide by num_microbatches.
    broadcast_args: extra per-sample block inputs (e.g. RoPE positions,
        (B, N, 2)) — microbatched alongside x.
    data_axis: optional second mesh axis for pp x dp composition (the pod
        layout): each microbatch's batch dim is sharded over ``data_axis``
        within every stage, so a ("stage", "data") mesh runs S stages each
        holding a dp-replica group. Params stay depth-sharded over
        ``stage_axis`` and replicated over ``data_axis``; the stage-to-stage
        ppermute and the final psum act per data coordinate.
    model_axis: optional third mesh axis for pp x (dp x) tp — the full 3D
        pod layout. The shard_map goes PARTIAL-MANUAL (``axis_names`` =
        the stage/data axes only): ``model_axis`` stays an auto/GSPMD axis,
        so inside each stage XLA partitions the block matmuls from the
        params' TP shardings (apply them with
        ``shard_stacked_state(..., model_axis="model")``) and inserts the
        tensor-parallel all-reduces itself — the same mechanism as the
        non-pipelined TP path (parallel/mesh.py), composed with the manual
        pipeline schedule. Activations replicate over ``model_axis``
        (Megatron-style).
    Semantics match ``scan_blocks(stacked, x, *broadcast_args)`` exactly;
    only the execution schedule differs.
    """
    depth = stacked.stacked_depth
    num_stages = mesh.shape[stage_axis]
    assert depth % num_stages == 0, f"depth {depth} not divisible by {num_stages} stages"
    batch = x.shape[0]
    M = num_microbatches or num_stages
    assert batch % M == 0, f"batch {batch} not divisible by {M} microbatches"
    if data_axis is not None:
        d = mesh.shape[data_axis]
        assert (batch // M) % d == 0, f"microbatch {batch // M} not divisible by data axis {d}"

    graphdef, state = nnx.split(stacked)

    def to_microbatches(a):
        return a.reshape(M, batch // M, *a.shape[1:])

    xm = to_microbatches(x)
    argsm = tuple(to_microbatches(a) for a in broadcast_args)

    def stage_fn(local_state, mb, args_mb):
        def body(c, block_state):
            blk = nnx.merge(graphdef, block_state)
            return blk(c, *args_mb), None

        out, _ = jax.lax.scan(body, mb, local_state)
        return out

    # microbatch arrays are (M, mb, ...): shard the per-microbatch batch dim
    # (axis 1) over the data axis when composing pp x dp
    act_spec = P(None, data_axis) if data_axis is not None else P()

    # pp x tp: manual over stage/data only; model_axis stays auto (GSPMD)
    extra = {}
    if model_axis is not None:
        manual = {stage_axis} | ({data_axis} if data_axis is not None else set())
        extra["axis_names"] = frozenset(manual)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(stage_axis), state), act_spec, act_spec),
        out_specs=act_spec,
        **extra,
    )
    def run(local_state, xm, argsm):
        s_idx = jax.lax.axis_index(stage_axis)
        S = num_stages
        mb_shape = xm.shape[1:]
        recv = jnp.zeros(mb_shape, xm.dtype)
        outs = jnp.zeros((M,) + mb_shape, xm.dtype)
        # static schedule: step t runs microbatch (t - s) on stage s
        for t in range(M + S - 1):
            m_in = min(t, M - 1)  # stage 0's input index (masked when t >= M)
            inp = jnp.where(s_idx == 0, xm[m_in], recv)
            # stage s processes microbatch t - s at step t; its broadcast
            # args (RoPE positions etc.) must come from that microbatch
            m_here = jnp.clip(t - s_idx, 0, M - 1)
            args_mb = tuple(a[m_here] for a in argsm)
            y = stage_fn(local_state, inp, args_mb)
            if S > 1:
                recv = jax.lax.ppermute(y, stage_axis, [(i, i + 1) for i in range(S - 1)])
            m_out = t - (S - 1)  # microbatch finishing on the LAST stage at step t
            if m_out >= 0:
                outs = outs.at[m_out].set(y)
        # only the last stage's outs are real; broadcast them to all stages
        outs = jax.lax.psum(jnp.where(s_idx == S - 1, outs, jnp.zeros_like(outs)), stage_axis)
        return outs

    outs = run(state, xm, argsm)
    return outs.reshape(batch, *x.shape[1:])
