"""
Sharded inference: the serving-side twin of parallel/training.py.

The reference serves on one GPU; this builds a jitted, mesh-sharded
forward for DUSt3R-style two-view models — batch split over the "data"
axis, params replicated (or TP-sharded over "model"), with XLA inserting
the ICI collectives. Use with data/pipeline.prefetch_to_device to keep
chips fed.
"""

from typing import Any, Callable, Optional, Tuple

import jax
from flax import nnx

from uniception_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch, tp_shard_state

__all__ = ["make_infer_fn", "InferContext"]


class InferContext:
    "Holds the mesh and the jitted sharded forward."

    def __init__(self, mesh, infer):
        self.mesh = mesh
        self.infer = infer

    def shard(self, batch):
        "Place a host batch onto the mesh, split along the data axis."
        return shard_batch(batch, self.mesh)


def make_infer_fn(
    model: nnx.Module,
    forward: Optional[Callable] = None,
    data: int = -1,
    model_axis: int = 1,
    use_tp: bool = False,
) -> Tuple[InferContext, Any]:
    """Build a dp(+tp) sharded inference fn for a DUSt3R-style model.

    Returns (context, params_state). The call signature is
    ``ctx.infer(params, img1, img2) -> (res1, res2)``; shard inputs with
    ``ctx.shard((img1, img2))`` first.

    forward: optional ``f(model, *inputs)`` override (defaults to
    ``model.forward_pair``).
    """
    mesh = make_mesh(data=data, model=model_axis)
    graphdef, state = nnx.split(model)

    if mesh.devices.size > 1:
        # pallas_call does not SPMD-partition: on any multi-device mesh
        # (w_q sharded over "model" under TP, or batch-sharded activations
        # under plain DP) the shape-gated Pallas int8 matmul (nn/quant.py)
        # must stay on the XLA lowering, which GSPMD partitions correctly.
        # force_xla_int8 wins over UNICEPTION_TPU_INT8_MATMUL=pallas/auto.
        from uniception_tpu.nn.quant import force_xla_int8

        force_xla_int8(True)

    with mesh:
        state = tp_shard_state(state, mesh) if (use_tp and model_axis > 1) else replicate_state(state, mesh)

    if forward is None:
        def forward(m, img1, img2):
            return m.forward_pair(img1, img2)

    @jax.jit
    def infer(state, *inputs):
        m = nnx.merge(graphdef, state)
        return forward(m, *inputs)

    return InferContext(mesh, infer), state
