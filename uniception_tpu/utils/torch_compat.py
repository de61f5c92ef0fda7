"""
PyTorch <-> JAX weight bridging.

Implements the checkpoint contract of the reference library
(``ckpt["model"]`` is a torch state dict; reference: encoders/croco.py:99-111)
for nnx modules whose attribute names mirror the torch module names.

Conventions handled automatically:
    * nnx.Linear kernel (in, out)        <- torch weight (out, in), transposed
    * nnx.Conv kernel (kh, kw, in, out)  <- torch Conv2d weight (out, in, kh, kw)
    * nnx.ConvTranspose kernel (kh, kw, in, out) <- torch (in, out, kh, kw)
    * nnx.LayerNorm scale/bias           <- torch weight/bias
    * nnx.GroupNorm scale/bias           <- torch weight/bias
    * everything else (Param leaves)     <- same-named tensor, same shape

Torch is only needed to *read* .pth files (scripts/convert); this module
itself only needs numpy arrays keyed by dotted names.
"""

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

__all__ = ["load_torch_state_dict", "state_dict_from_module", "torch_key_for"]


def _leaf_entries(module: nnx.Module) -> List[Tuple[str, Any, str, Any]]:
    """Yield (dotted_path, owner_module, attr_name, variable) for each Param leaf."""
    entries = []
    for path, mod in nnx.iter_modules(module):
        for attr, val in vars(mod).items():
            if isinstance(val, nnx.Param):
                dotted = ".".join(str(p) for p in path + (attr,))
                entries.append((dotted, mod, attr, val))
    return entries


def _stacked_roots(module: nnx.Module) -> Dict[str, int]:
    """Dotted paths of depth-stacked block modules (nn/scan.py) -> depth.

    A stacked module stores one block whose params carry a leading depth
    axis; torch checkpoints address the same weights as ``root.{i}.rest``.
    """
    roots = {}
    for path, mod in nnx.iter_modules(module):
        depth = getattr(mod, "stacked_depth", None)
        if isinstance(depth, int):
            roots[".".join(str(p) for p in path)] = depth
    return roots


def _stacked_root_for(dotted: str, roots: Dict[str, int]):
    for root, depth in roots.items():
        if dotted.startswith(root + "."):
            return root, depth
    return None


def torch_key_for(dotted: str, owner: nnx.Module, attr: str) -> str:
    "Translate an nnx leaf path to the corresponding torch state-dict key."
    if isinstance(owner, (nnx.Linear, nnx.Conv, nnx.ConvTranspose)) and attr == "kernel":
        return dotted.rsplit(".", 1)[0] + ".weight"
    if isinstance(owner, (nnx.LayerNorm, nnx.GroupNorm, nnx.RMSNorm, nnx.BatchNorm)) and attr == "scale":
        return dotted.rsplit(".", 1)[0] + ".weight"
    if isinstance(owner, nnx.Embed) and attr == "embedding":
        return dotted.rsplit(".", 1)[0] + ".weight"  # torch nn.Embedding, same (V, C) layout
    return dotted


def _to_jax(owner: nnx.Module, attr: str, torch_arr: np.ndarray, target_shape) -> np.ndarray:
    if isinstance(owner, nnx.Linear) and attr == "kernel":
        return np.ascontiguousarray(torch_arr.T)
    if isinstance(owner, nnx.Conv) and attr == "kernel":
        if torch_arr.ndim == 5:  # Conv3d: (out, in, kt, kh, kw) -> (kt, kh, kw, in, out)
            return np.ascontiguousarray(np.transpose(torch_arr, (2, 3, 4, 1, 0)))
        return np.ascontiguousarray(np.transpose(torch_arr, (2, 3, 1, 0)))
    if isinstance(owner, nnx.ConvTranspose) and attr == "kernel":
        # torch: (in, out, kh, kw) -> flax: (kh, kw, in, out), spatially
        # flipped (torch's conv_transpose scatters the kernel directly while
        # flax with transpose_kernel=False correlates with the mirrored one).
        return np.ascontiguousarray(np.transpose(torch_arr[:, :, ::-1, ::-1], (2, 3, 0, 1)))
    return torch_arr


def _from_jax(owner: nnx.Module, attr: str, jax_arr: np.ndarray) -> np.ndarray:
    if isinstance(owner, nnx.Linear) and attr == "kernel":
        return np.ascontiguousarray(jax_arr.T)
    if isinstance(owner, nnx.Conv) and attr == "kernel":
        if jax_arr.ndim == 5:
            return np.ascontiguousarray(np.transpose(jax_arr, (4, 3, 0, 1, 2)))
        return np.ascontiguousarray(np.transpose(jax_arr, (3, 2, 0, 1)))
    if isinstance(owner, nnx.ConvTranspose) and attr == "kernel":
        return np.ascontiguousarray(np.transpose(jax_arr, (2, 3, 0, 1))[:, :, ::-1, ::-1])
    return np.asarray(jax_arr)


def _host_cast(arr: np.ndarray, dtype) -> np.ndarray:
    """to_device=False assignment: keep the leaf on host but in the MODULE's
    dtype (matching the dtype cast the eager ``to_device=True`` path applies
    on assignment). A matching dtype is a no-op; a module narrower than the
    checkpoint (e.g. bf16 params from an f32 interchange file) also halves
    the bytes the later batched transfer moves."""
    want = np.dtype(jnp.dtype(dtype))  # ml_dtypes-backed for bf16 et al.
    return arr if arr.dtype == want else arr.astype(want)


def load_torch_state_dict(
    module: nnx.Module,
    state_dict: Dict[str, np.ndarray],
    strict: bool = True,
    verbose: bool = True,
    ignore: Tuple[str, ...] = (),
    to_device: bool = True,
) -> Tuple[List[str], List[str]]:
    """Load a torch-layout state dict (numpy arrays) into an nnx module in place.

    Returns (missing_keys, unexpected_keys), mirroring torch's
    ``load_state_dict`` report printed by the reference loaders.

    ``ignore`` is a tuple of regex patterns for checkpoint keys that are
    known aliases of other keys (e.g. the reference DPT registers the same
    convs under scratch.layer{i}_rn AND scratch.layer_rn.{i-1}); matching
    keys are dropped before matching and never reported as unexpected.

    ``to_device=False`` keeps each assigned leaf as a host numpy array
    (no per-parameter device transfer) — the serving cold-start path,
    where :func:`uniception_tpu.utils.coldstart.materialize` later ships
    the whole tree in one packed transfer. Leaves whose checkpoint dtype
    already matches the module's stay untouched; mismatched ones are cast
    host-side to the module's dtype so the path stays equivalent to the
    eager load (which casts on every assignment). Works on
    abstractly-constructed modules (``nnx.eval_shape``) whose leaves are
    ShapeDtypeStructs.
    """
    if ignore:
        import re

        pats = [re.compile(p) for p in ignore]
        state_dict = {k: v for k, v in state_dict.items() if not any(p.search(k) for p in pats)}
    used = set()
    missing = []
    roots = _stacked_roots(module)
    for dotted, owner, attr, var in _leaf_entries(module):
        tkey = torch_key_for(dotted, owner, attr)
        stacked = _stacked_root_for(dotted, roots)
        if stacked is not None:
            # depth-stacked block (nn/scan.py): torch keys are root.{i}.rest
            root, depth = stacked
            rest = tkey[len(root) + 1:]
            tkeys = [f"{root}.{i}.{rest}" for i in range(depth)]
            absent = [k for k in tkeys if k not in state_dict]
            if absent:
                missing.extend(absent)
                continue
            arrs = [_to_jax(owner, attr, np.asarray(state_dict[k]), var.shape) for k in tkeys]
            arr = np.stack(arrs)
            cur = var.get_value()  # works for abstract (ShapeDtypeStruct) leaves too
            if arr.shape != cur.shape:
                raise ValueError(f"Shape mismatch for {root}.*.{rest}: torch {arr.shape} vs module {cur.shape}")
            var.set_value(jnp.asarray(arr, dtype=cur.dtype) if to_device else _host_cast(arr, cur.dtype))
            used.update(tkeys)
            continue
        if tkey not in state_dict:
            missing.append(tkey)
            continue
        arr = np.asarray(state_dict[tkey])
        arr = _to_jax(owner, attr, arr, var.shape)
        cur = var.get_value()  # works for abstract (ShapeDtypeStruct) leaves too
        if arr.shape != cur.shape:
            raise ValueError(f"Shape mismatch for {tkey}: torch {arr.shape} vs module {cur.shape}")
        var.set_value(jnp.asarray(arr, dtype=cur.dtype) if to_device else _host_cast(arr, cur.dtype))
        used.add(tkey)

    unexpected = [k for k in state_dict.keys() if k not in used]
    if verbose and (missing or unexpected):
        print(f"load_torch_state_dict: missing_keys={missing}, unexpected_keys={unexpected}")
    if strict and (missing or unexpected):
        # torch's load_state_dict(strict=True) raises on both kinds; silently
        # dropping unexpected tensors would hide key-mapping mistakes.
        raise KeyError(f"strict load failed: missing_keys={missing}, unexpected_keys={unexpected}")
    return missing, unexpected


def state_dict_from_module(module: nnx.Module) -> Dict[str, np.ndarray]:
    "Export the module's params as a torch-layout state dict (numpy arrays)."
    out = {}
    roots = _stacked_roots(module)
    for dotted, owner, attr, var in _leaf_entries(module):
        tkey = torch_key_for(dotted, owner, attr)
        stacked = _stacked_root_for(dotted, roots)
        if stacked is not None:
            root, depth = stacked
            rest = tkey[len(root) + 1:]
            arr = np.asarray(var[...])
            for i in range(depth):
                out[f"{root}.{i}.{rest}"] = _from_jax(owner, attr, arr[i])
            continue
        out[tkey] = _from_jax(owner, attr, np.asarray(var[...]))
    return out
