"""
Multi-host (pod) initialization.

The reference is single-GPU; this is the TPU-native scaling entry point
(SURVEY.md §2.8): `jax.distributed.initialize` for multi-host pods, plus a
helper to build the global ("data", "model") mesh across all hosts with the
"model" axis kept inside ICI-adjacent device blocks.
"""

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uniception_tpu.parallel.mesh import make_mesh

__all__ = ["initialize_multihost", "global_mesh", "shard_local_batch"]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize jax.distributed for a multi-host pod.

    On Cloud TPU all arguments are auto-detected from the environment; pass
    them explicitly for other launchers.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address, num_processes=num_processes, process_id=process_id
        )
    jax.distributed.initialize(**kwargs)
    print(
        f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )


def global_mesh(model_axis: int = 1):
    """Build the global ("data", "model") mesh over all devices.

    JAX orders jax.devices() so that contiguous blocks are ICI-adjacent;
    keeping "model" as the minor axis keeps tensor-parallel collectives
    on-chip-interconnect rather than DCN.
    """
    return make_mesh(data=-1, model=model_axis, devices=jax.devices())


def shard_local_batch(batch, mesh: Mesh, axis: str = "data"):
    """Assemble a global batch from each process's LOCAL shard.

    The multi-host counterpart of ``mesh.shard_batch``: every process passes
    only the rows it loaded (global_batch / process_count of them), and the
    result is a global jax.Array sharded along `axis` — no cross-host data
    movement, each host's rows land on its own devices. Leaves must have
    equal leading-axis length on every process.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
