"""
Shared pytree path utilities.

One canonical keypath -> dotted-string conversion used by the native
serving checkpoint format (utils/coldstart.py), the tensor-parallel
sharding rules (parallel/mesh.py), and tests — these must agree exactly
or checkpoint keys silently stop matching sharding-rule paths.
"""

import jax

__all__ = ["keypath_str", "state_paths"]


def keypath_str(keypath) -> str:
    "jax.tree_util keypath -> dotted string ('encoder.blocks.0.qkv.kernel.value')."
    parts = []
    for k in keypath:
        key = getattr(k, "key", None)
        if key is None:
            key = getattr(k, "idx", None)
        if key is None:
            key = getattr(k, "name", None)
        parts.append(str(key))
    return ".".join(parts)


def state_paths(tree) -> list:
    "Dotted path per jax.tree leaf, in tree-flatten order."
    return [keypath_str(kp) for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]]
