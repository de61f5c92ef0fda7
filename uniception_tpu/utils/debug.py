"""
Numerics debugging helpers.

The reference has no sanitizers (SURVEY.md §5); the TPU-native equivalents
are jax-level: checkify-wrapped forwards that turn NaN/Inf into hard errors
and a lightweight nan-scan over pytrees.
"""

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

__all__ = ["checkify_nan", "find_nonfinite", "assert_finite"]


def checkify_nan(fn: Callable) -> Callable:
    """Wrap a jittable function so NaN/Inf in any intermediate raises.

    Returns a function with the same signature; call `.throw()` is handled
    internally (errors surface as Python exceptions after the step).
    """
    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def find_nonfinite(tree: Any, prefix: str = "") -> list:
    "Return [(path, n_nan, n_inf)] for every array leaf with non-finite values."
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            continue
        n_nan = int(jnp.isnan(arr).sum())
        n_inf = int(jnp.isinf(arr).sum())
        if n_nan or n_inf:
            bad.append((prefix + jax.tree_util.keystr(path), n_nan, n_inf))
    return bad


def assert_finite(tree: Any, label: str = "tree"):
    "Raise with a per-leaf report if any array in the pytree is non-finite."
    bad = find_nonfinite(tree)
    if bad:
        lines = "\n".join(f"  {p}: {n} NaN, {i} Inf" for p, n, i in bad)
        raise FloatingPointError(f"Non-finite values in {label}:\n{lines}")
