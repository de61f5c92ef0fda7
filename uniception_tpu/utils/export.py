"""
AOT serving artifacts via ``jax.export``.

The last Python-side costs in a serving cold start (after the native
checkpoint + persistent compile cache work in ``utils/coldstart.py`` /
``utils/compile_cache.py``) are model construction and the jit TRACE of
the forward program. This module removes both: the traced + lowered
computation (StableHLO with its calling convention) is serialized to a
self-describing artifact at build time. A serving process then needs

    * NO model code and NO nnx construction — only this module,
    * param leaves fed straight from a native checkpoint in the order
      recorded in the artifact header,
    * one XLA compile, which the persistent compile cache reduces to a
      disk read on warm restarts.

Cross-platform: pass ``platforms=("cpu", "tpu")`` to build a TPU serving
artifact on a CPU-only machine (lowering does not need a TPU client).
Caveat: kernel routing (Pallas flash attention vs the XLA path,
``ops/attention.py::_on_tpu``) happens at TRACE time, so artifacts built
on a non-TPU host embed the XLA attention lowering — numerically
equivalent but slower on chip. Build artifacts on the TPU host to embed
the Pallas kernels.

Reference parity note: the reference ships torch state dicts and re-runs
module construction + dispatch per process (e.g. the Cosmos tokenizer
loads TorchScript JITs, ``libs/cosmos_tokenizer/utils.py:96-137`` — the
closest analogue to an AOT artifact it has). This is the TPU-native
equivalent of that serving story for every model in the framework.

Typical flow::

    # build host (offline, once)
    model = DUSt3R(...); load weights
    save_native_state("m.nsv", model, dtype=jnp.bfloat16)
    save_serving_artifact("m.jexp", model, (img_spec, img_spec))

    # serving host (no model code)
    art = load_serving_artifact("m.jexp")
    arrays, _ = load_native_state("m.nsv")
    fn = art.bind(arrays)            # jitted; params are closure constants
    res1, res2 = fn(img1, img2)
"""

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from flax import nnx

from uniception_tpu.utils.framing import read_framed_header, write_framed_header
from uniception_tpu.utils.pytree import state_paths as _state_paths

__all__ = ["save_serving_artifact", "load_serving_artifact", "ServingArtifact"]

_MAGIC = b"UTPEXP1\n"


def _leaf_spec(x) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(tuple(x.shape), jax.dtypes.canonicalize_dtype(x.dtype))


def save_serving_artifact(
    path: str,
    module: nnx.Module,
    example_inputs: Sequence[Any],
    method="forward_pair",
    platforms: Optional[Sequence[str]] = None,
    **metadata,
) -> None:
    """Export ``module.<method>(*example_inputs)`` to an AOT artifact.

    The module's RNG state is captured as constants (serving forwards are
    deterministic); every other state leaf becomes a positional input so
    weights stay OUT of the artifact — they ship via the native
    checkpoint, matched by the dotted state paths stored in the header.

    example_inputs: arrays or ShapeDtypeStructs fixing the input
        shapes/dtypes (one artifact per served shape, like any AOT
        system; XLA's static-shape model makes this explicit).
    method: a method name, or a callable ``fn(module, *inputs)`` for
        serving entry points that wrap the module (e.g. on-device uint8
        normalization around ``forward_pair``).
    platforms: lowering platforms, e.g. ``("cpu", "tpu")``; defaults to
        the current backend.
    """
    graphdef, rng_state, state = nnx.split(module, nnx.RngState, ...)
    leaves, treedef = jax.tree.flatten(state)
    paths = _state_paths(state)
    assert len(paths) == len(leaves)

    def apply(leaf_list, *inputs):
        st = jax.tree.unflatten(treedef, leaf_list)
        m = nnx.merge(graphdef, rng_state, st)
        if callable(method):
            return method(m, *inputs)
        return getattr(m, method)(*inputs)

    leaf_specs = [_leaf_spec(x) for x in leaves]
    input_specs = [x if isinstance(x, jax.ShapeDtypeStruct) else _leaf_spec(x) for x in example_inputs]
    exp = jax.export.export(
        jax.jit(apply), platforms=list(platforms) if platforms is not None else None
    )(leaf_specs, *input_specs)
    blob = exp.serialize()

    header = {
        "format": "uniception_tpu_serving_artifact",
        "method": method if isinstance(method, str) else getattr(method, "__qualname__", "callable"),
        "param_paths": paths,
        "param_specs": [[list(s.shape), s.dtype.name] for s in leaf_specs],
        "input_specs": [[list(s.shape), s.dtype.name] for s in input_specs],
        "platforms": list(exp.platforms),
        "meta": metadata,
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        write_framed_header(f, _MAGIC, header)
        f.write(blob)


class ServingArtifact:
    """A deserialized AOT serving artifact.

    Attributes:
        param_paths: dotted state paths, in the exported calling order.
        exported: the underlying ``jax.export.Exported``.
        meta: user metadata passed at save time.
    """

    def __init__(self, exported, header: Dict[str, Any]):
        self.exported = exported
        self.header = header
        self.param_paths = header["param_paths"]
        self.meta = header.get("meta", {})

    def order_params(self, arrays) -> list:
        """Order a native-checkpoint mapping (dotted path -> array) into the
        exported calling convention. Zero-copy for packed checkpoints."""
        missing = [p for p in self.param_paths if p not in arrays]
        if missing:
            raise ValueError(f"native state is missing {len(missing)} artifact params (e.g. {missing[:3]})")
        return [arrays[p] for p in self.param_paths]

    def call(self, params: list, *inputs):
        "Raw exported call: params in calling order, then the model inputs."
        return self.exported.call(params, *inputs)

    def bind(self, arrays, device=None):
        """Close over checkpoint params and return a jitted ``fn(*inputs)``.

        ``arrays`` maps dotted path -> array (``load_native_state`` output,
        packed or dict). Params transfer once (batched device_put) and are
        captured; subsequent calls pay only the input transfer.
        """
        ordered = [np.ascontiguousarray(a) for a in self.order_params(arrays)]
        dev = jax.device_put(ordered, device) if device is not None else jax.device_put(ordered)
        exported_call = self.exported.call

        def fn(*inputs):
            return exported_call(dev, *inputs)

        return jax.jit(fn)


def load_serving_artifact(path: str) -> ServingArtifact:
    "Load a :func:`save_serving_artifact` file. No model code required."
    with open(path, "rb") as f:
        header = read_framed_header(f, _MAGIC, what="serving artifact")
        blob = f.read()
    exp = jax.export.deserialize(blob)
    return ServingArtifact(exp, header)
