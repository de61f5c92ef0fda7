"""
Device-mesh and sharding utilities.

The reference is single-GPU (SURVEY.md §2.8: no torch.distributed/NCCL
anywhere); this module is the TPU-native scaling layer the rebuild adds:
``jax.sharding.Mesh`` + NamedSharding rules for data-parallel (batch axis)
and tensor-parallel (attention-head / MLP-hidden axis) execution. XLA
inserts the ICI collectives from the sharding constraints — no explicit
communication code.

Axes convention (scaling-book style):
    * "data"  — batch sharding (pure DP)
    * "model" — attention heads / MLP hidden sharding (TP)
"""

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicate_state",
    "tp_shard_state",
    "leaf_tp_spec",
    "shard_batch",
    "zero1_shard_state",
    "fsdp_shard_state",
    "TP_RULES",
]


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Create a ("data", "model") mesh.

    data=-1 consumes all remaining devices. The "model" axis should map to
    an ICI-adjacent device block (JAX's default device order does this for
    TPU slices).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


# Tensor-parallel sharding rules for the transformer blocks in nn/blocks.py.
# Keys are regexes over dotted state paths; values are PartitionSpecs.
# Column-parallel (shard output features): qkv, fc1, w12.
# Row-parallel (shard input features): proj, fc2, w3.
TP_RULES = [
    (re.compile(r".*\b(qkv|projq|projk|projv)\.kernel$"), P(None, "model")),
    (re.compile(r".*\b(qkv|projq|projk|projv)\.bias$"), P("model")),
    (re.compile(r".*\b(fc1|w12)\.kernel$"), P(None, "model")),
    (re.compile(r".*\b(fc1|w12)\.bias$"), P("model")),
    (re.compile(r".*\battn\.proj\.kernel$"), P("model", None)),
    (re.compile(r".*\bcross_attn\.proj\.kernel$"), P("model", None)),
    (re.compile(r".*\b(fc2|w3)\.kernel$"), P("model", None)),
    # Int8Linear (nn/quant.py) stores its weight as w_q (in, out) int8 plus
    # a per-output-channel w_scale (1, out); shard them like the bf16 kernel
    # they replace. Column-parallel w_scale shards with the output axis;
    # row-parallel w_scale is per-output (tiny) and stays replicated.
    (re.compile(r".*\b(qkv|projq|projk|projv)\.w_q$"), P(None, "model")),
    (re.compile(r".*\b(qkv|projq|projk|projv)\.w_scale$"), P(None, "model")),
    (re.compile(r".*\b(qkv|projq|projk|projv)\.w_colsum$"), P(None, "model")),
    (re.compile(r".*\b(fc1|w12)\.w_q$"), P(None, "model")),
    (re.compile(r".*\b(fc1|w12)\.w_scale$"), P(None, "model")),
    (re.compile(r".*\b(fc1|w12)\.w_colsum$"), P(None, "model")),
    # row-parallel w_colsum (fc2/proj) is precomputed from the FULL kernel
    # and added AFTER the partial-sum reduce (like bias) — stays replicated
    # (the default rule), so no explicit entries for it here.
    (re.compile(r".*\battn\.proj\.w_q$"), P("model", None)),
    (re.compile(r".*\bcross_attn\.proj\.w_q$"), P("model", None)),
    (re.compile(r".*\b(fc2|w3)\.w_q$"), P("model", None)),
]


def _spec_for(path: str, rules) -> P:
    for pattern, spec in rules:
        if pattern.match(path):
            return spec
    return P()  # replicated


def _dotted(path_tuple) -> str:
    return ".".join(str(p) for p in path_tuple)


def replicate_state(state, mesh: Mesh):
    "Replicate a full nnx state pytree across the mesh (pure DP)."
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def leaf_tp_spec(path: str, leaf, mesh: Mesh, rules=None) -> P:
    """The PartitionSpec ``tp_shard_state`` would give one leaf.

    path: dotted state path (a trailing '.value' from flax VariableState
    flattening is stripped so rules can anchor on '...kernel$'). Handles
    the scan-layout leading depth axis and the divisibility fallback.
    """
    rules = rules if rules is not None else TP_RULES
    if path.endswith(".value"):
        path = path[: -len(".value")]
    model_size = mesh.shape["model"]
    spec = _spec_for(path, rules)
    # depth-stacked (scan-layout, nn/scan.py) params carry a leading
    # depth axis; shift the rule right so the same feature axis shards
    if len(spec) > 0 and getattr(leaf, "ndim", 0) == len(spec) + 1:
        spec = P(None, *spec)
    # verify divisibility; fall back to replication otherwise
    for dim, axis in enumerate(spec):
        if axis is not None and (dim >= getattr(leaf, "ndim", 0) or leaf.shape[dim] % model_size != 0):
            return P()
    return spec


def tp_shard_state(state, mesh: Mesh, rules=None):
    """Shard an nnx state pytree with tensor-parallel rules.

    Parameters whose path matches a rule get that PartitionSpec; everything
    else is replicated. Shapes not divisible by the mesh axis fall back to
    replication (e.g. tiny norm params).
    """
    from uniception_tpu.utils.pytree import keypath_str

    flat = list(jax.tree_util.tree_flatten_with_path(state)[0])
    treedef = jax.tree_util.tree_structure(state)

    leaves = []
    for keypath, leaf in flat:
        spec = leaf_tp_spec(keypath_str(keypath), leaf, mesh, rules)
        leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def zero1_shard_state(state, mesh: Mesh):
    """ZeRO-1: shard a pytree (optimizer moments) over the "data" axis.

    Each array leaf gets PartitionSpec "data" on its largest axis divisible
    by the data-axis size that is not already sharded (leaves produced by
    ``tx.init`` on tp-sharded params keep their "model" axes). Scalars and
    indivisible leaves stay replicated. With params replicated and moments
    sharded, XLA's SPMD partitioner computes each device's slice of the
    optimizer update and all-gathers only the parameter delta — the ZeRO-1
    communication pattern — cutting optimizer-state memory by the data-axis
    size. (The reference has no trainer at all, SURVEY.md §2.8; this is
    TPU-native scaling the rebuild adds.)
    """
    return _data_shard_largest_axis(state, mesh)


def fsdp_shard_state(state, mesh: Mesh):
    """FSDP / ZeRO-3: shard PARAMETERS over the "data" axis.

    Same per-leaf rule as :func:`zero1_shard_state` (largest free axis
    divisible by the data-axis size; existing "model" axes from TP are
    preserved, scalars/indivisible leaves replicate), applied to the
    parameter pytree itself. Per-chip parameter (and, since ``tx.init``
    inherits shardings, optimizer-state) memory drops by the data-axis
    size; XLA's SPMD partitioner inserts the all-gather before each
    layer's use and reduce-scatters the gradients — the FSDP
    communication pattern — purely from the sharding constraints
    (scaling-book recipe; no hand-written collectives).
    """
    return _data_shard_largest_axis(state, mesh)


def _data_shard_largest_axis(state, mesh: Mesh):
    data_size = mesh.shape["data"]

    def shard_leaf(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or data_size == 1:
            return jax.device_put(x, NamedSharding(mesh, P())) if hasattr(x, "ndim") else x
        existing = [None] * x.ndim
        shard = getattr(x, "sharding", None)
        if isinstance(shard, NamedSharding):
            spec = list(shard.spec) + [None] * (x.ndim - len(shard.spec))
            existing = spec[: x.ndim]
        if "data" in existing:
            # already data-sharded (e.g. a checkpoint restored with its
            # sharding intact) — re-placing it with the same spec is
            # idempotent; adding another 'data' axis would be invalid
            return jax.device_put(x, NamedSharding(mesh, P(*existing)))
        candidates = [
            d for d in range(x.ndim) if existing[d] is None and x.shape[d] % data_size == 0 and x.shape[d] > 1
        ]
        if not candidates:
            return jax.device_put(x, NamedSharding(mesh, P(*existing)))
        axis = max(candidates, key=lambda d: x.shape[d])
        existing[axis] = "data"
        return jax.device_put(x, NamedSharding(mesh, P(*existing)))

    return jax.tree.map(shard_leaf, state)


def shard_batch(batch, mesh: Mesh):
    "Shard array leaves along their leading (batch) axis over the 'data' axis."
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
