"""
Multi-host (pod) initialization.

The reference is single-GPU; this is the TPU-native scaling entry point
(SURVEY.md §2.8): `jax.distributed.initialize` for multi-host pods, plus a
helper to build the global ("data", "model") mesh across all hosts with the
"model" axis kept inside ICI-adjacent device blocks.
"""

from typing import Optional

import jax

from uniception_tpu.parallel.mesh import make_mesh

__all__ = ["initialize_multihost", "global_mesh"]


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
