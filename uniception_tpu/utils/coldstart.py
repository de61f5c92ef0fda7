"""
Serving cold-start: abstract construction + batched weight materialization.

The reference constructs modules eagerly and loads checkpoints with
torch.load + load_state_dict (reference: uniception/models/encoders/
croco.py:99-111) — fine on a local GPU. On a TPU host that path is
latency-bound three times over: eager construction pays one dispatch per
initializer op, a per-leaf weight load pays one transfer dispatch per
parameter (~900 for ViT-L DUSt3R), and torch-layout checkpoints pay a
host transpose/stack pass per kernel. This module removes all three
(measured, scan-layout DUSt3R ViT-L 512, fenced, CPU backend — see
BASELINE.md "Serving cold-start" for the full account incl. the TPU
tunnel's link-bound caveat):

  * :func:`abstract_construct` — ``nnx.eval_shape`` over the constructor:
    no device work at all (~0.6 s vs 7.3 s eager fast-init, 42 s eager).
  * :func:`materialize` — ship the weights as a handful of buffers (one
    per dtype section of a packed checkpoint, else one batched
    ``device_put``), then unpack / cast / zero-fill in a single jitted
    program. Abstract leaves that were never loaded become on-device
    zeros inside that program (no transfer); PRNG-key leaves are freshly
    seeded.
  * :func:`save_native_state` / :func:`load_native_state` — a serving
    checkpoint format in the module's OWN layout (kernels transposed,
    scan-stacked, pre-cast to bf16, dtype-grouped), so loading is a
    zero-copy mmap with no host-side transforms. End-to-end
    time-to-weights 4.6 s vs 151.8 s for the torch-layout interchange
    path (46 s zip read + ~100 s host transforms) — pay the transforms
    once offline (``scripts/convert_checkpoints.py --serving``), not per
    cold start.

Typical serving path (see examples/serve_dust3r.py):

    model = abstract_construct(lambda: DUSt3R(..., rngs=nnx.Rngs(0)))
    arrays, meta = load_native_state("dust3r.nsv")
    model = materialize(model, arrays=arrays, param_dtype=jnp.bfloat16)

or, from a torch-layout checkpoint (slower, host transforms):

    model = abstract_construct(lambda: DUSt3R(..., rngs=nnx.Rngs(0)))
    load_torch_state_dict(model, ckpt["model"], to_device=False)
    model = materialize(model, param_dtype=jnp.bfloat16)
"""

import json
import os
from collections.abc import Mapping as _Mapping
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

__all__ = [
    "abstract_construct",
    "materialize",
    "save_native_state",
    "load_native_state",
    "is_native_state",
    "PackedNativeState",
]

_META_KEY = "__native_state_meta__"


def abstract_construct(thunk: Callable[[], nnx.Module]) -> nnx.Module:
    """Construct a module abstractly: initializers trace but never execute,
    so no device dispatch and no PRNG compute happens. Leaves are
    ``jax.ShapeDtypeStruct``; fill them host-side (e.g.
    ``load_torch_state_dict(..., to_device=False)`` or via ``arrays=`` in
    :func:`materialize`) and materialize."""
    return nnx.eval_shape(thunk)


def _is_key(leaf) -> bool:
    return jax.dtypes.issubdtype(getattr(leaf, "dtype", None), jax.dtypes.prng_key)


# canonical keypath -> dotted-path conversion, shared with parallel/mesh.py
# so native-checkpoint keys always match sharding-rule paths
from uniception_tpu.utils.framing import read_framed_header, write_framed_header  # noqa: E402
from uniception_tpu.utils.pytree import state_paths as _state_paths  # noqa: E402


def materialize(
    module: nnx.Module,
    *,
    arrays: Optional[Dict[str, np.ndarray]] = None,
    param_dtype=None,
    device=None,
    mesh=None,
    use_tp: bool = False,
    tp_rules=None,
    seed: int = 0,
    verbose: bool = False,
) -> nnx.Module:
    """Realize a (partially) host-resident module on ``device`` with one
    batched transfer and one jitted finalize program.

    arrays: optional native-layout state (dotted state path -> numpy
        array, e.g. from :func:`load_native_state`) assigned by position
        before transfer — zero host-side transforms.
    param_dtype: target dtype for floating-point leaves (serving:
        ``jnp.bfloat16``); the cast runs on device, which beats this
        host's numpy cast by ~10x (measured). Non-float leaves keep
        their dtype, and leaves filled from ``arrays`` keep the
        checkpoint's stored dtype (a native serving checkpoint is
        authoritative — e.g. bf16 params with f32 int8-quant scales).
    mesh: optional ``jax.sharding.Mesh`` — each leaf is transferred
        DIRECTLY into its serving sharding (replicated, or the
        tensor-parallel spec from ``parallel.mesh.TP_RULES`` when
        ``use_tp``), so sharded cold-start pays one transfer, not
        transfer-then-reshard. ``parallel.inference.make_infer_fn``'s own
        device_put is then a no-op (shardings already match). Mutually
        exclusive with ``device``.

    Host numpy leaves ship in ONE ``jax.device_put`` call (batched puts
    have no per-leaf round-trip cost, unlike per-leaf ``jnp.asarray``);
    ShapeDtypeStruct leaves (never loaded) become on-device zeros inside
    the finalize program; PRNG-key leaves are re-seeded from ``seed``.
    """
    assert device is None or mesh is None, "pass device or mesh, not both"
    graphdef, state = nnx.split(module)
    leaves, treedef = jax.tree.flatten(state)

    loaded = set()
    packed = arrays if isinstance(arrays, PackedNativeState) else None
    packed_map = {}  # leaf index -> (dtype, shape, byte offset) sourced from the blob
    paths = None  # computed lazily, shared by the arrays= and mesh= branches
    if arrays is not None:
        paths = _state_paths(state)
        for i, p in enumerate(paths):
            if p not in arrays:
                continue
            want = tuple(getattr(leaves[i], "shape", ()))
            if packed is not None and p in packed.index and p not in packed.overrides:
                dt, shape, eoff = packed.index[p]
                if tuple(shape) != want:
                    raise ValueError(f"native state {p}: shape {shape} != module {want}")
                packed_map[i] = (dt, tuple(shape), eoff)
                leaves[i] = jax.ShapeDtypeStruct(tuple(shape), dt)
            else:
                a = arrays[p]
                if tuple(a.shape) != want:
                    raise ValueError(f"native state {p}: shape {a.shape} != module {want}")
                leaves[i] = np.asarray(a)
            loaded.add(i)
        missing = [
            p
            for i, p in enumerate(paths)
            if isinstance(leaves[i], jax.ShapeDtypeStruct)
            and not _is_key(leaves[i])
            and i not in packed_map
        ]
        extra = set(arrays) - set(paths)
        if extra:
            raise ValueError(f"native state has unknown entries: {sorted(extra)[:5]} ...")
        if missing:
            print(f"materialize: {len(missing)} leaves not in native state -> zeros (e.g. {missing[:3]})")

    def target_dtype(leaf):
        dt = jnp.dtype(leaf.dtype)
        if param_dtype is not None and jnp.issubdtype(dt, jnp.floating):
            return jnp.dtype(param_dtype)
        return dt

    host_idx = [
        i
        for i, l in enumerate(leaves)
        if not _is_key(l) and (isinstance(l, np.ndarray) or np.isscalar(l))
    ]
    host_leaves = [np.ascontiguousarray(leaves[i]) for i in host_idx]

    _shard_for = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from uniception_tpu.parallel.mesh import leaf_tp_spec

        all_paths = paths if paths is not None else _state_paths(state)

        def _shard_for(i):
            if use_tp:
                return NamedSharding(mesh, leaf_tp_spec(all_paths[i], leaves[i], mesh, tp_rules))
            return NamedSharding(mesh, PartitionSpec())

        dev_args = jax.device_put(host_leaves, [_shard_for(i) for i in host_idx])
    elif device is not None:
        dev_args = jax.device_put(host_leaves, device)
    else:
        dev_args = jax.device_put(host_leaves)

    # the packed sections ship as a handful of 1-D buffers (one per dtype) —
    # on a dispatch-latency-bound backend this is the whole point (see
    # PackedNativeState docstring)
    if packed_map:
        blobs = packed.blobs
        if _shard_for is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            dev_blobs = jax.device_put(blobs, NamedSharding(mesh, PartitionSpec()))
        elif device is not None:
            dev_blobs = jax.device_put(blobs, device)
        else:
            dev_blobs = jax.device_put(blobs)
    else:
        dev_blobs = {}

    shapes = [tuple(getattr(l, "shape", ())) for l in leaves]
    # leaves filled from a native checkpoint keep the checkpoint's dtype —
    # save_native_state recorded the serving dtypes (e.g. bf16 params with
    # f32 Int8Linear scales); re-casting them here would destroy the
    # quantization scales' precision. param_dtype applies to everything
    # else (torch-layout loads, abstract zeros).
    tgt = [
        None if _is_key(l) else (jnp.dtype(l.dtype) if i in loaded else target_dtype(l))
        for i, l in enumerate(leaves)
    ]
    host_pos = {i: j for j, i in enumerate(host_idx)}
    produced_idx = [
        i
        for i, l in enumerate(leaves)
        if not _is_key(l) and (i in host_pos or isinstance(l, jax.ShapeDtypeStruct))
    ]

    def _from_blob(blobs, i):
        dt, shp, eoff = packed_map[i]
        n = int(np.prod(shp))
        return jax.lax.slice(blobs[dt.name], (eoff,), (eoff + n,)).reshape(shp)

    def finalize(args, blobs):
        out = []
        for i, leaf in enumerate(leaves):
            if _is_key(leaf):
                out.append(None)
            elif i in host_pos:
                out.append(args[host_pos[i]].astype(tgt[i]))
            elif i in packed_map:
                out.append(_from_blob(blobs, i).astype(tgt[i]))
            elif isinstance(leaf, jax.ShapeDtypeStruct):
                out.append(jnp.zeros(shapes[i], tgt[i]))
            else:
                out.append(None)  # concrete jax array: pass through outside
        return [o for o in out if o is not None]

    jit_kwargs = {"donate_argnums": (0, 1)}
    if _shard_for is not None:
        # keep each leaf in the sharding it was transferred into — without
        # this the compiler is free to re-layout the donated outputs
        jit_kwargs["out_shardings"] = [_shard_for(i) for i in produced_idx]
    if verbose:
        import time as _time

        t0 = _time.perf_counter()
        jax.block_until_ready((dev_args, dev_blobs))
        t_put = _time.perf_counter() - t0
        compiled = jax.jit(finalize, **jit_kwargs).lower(dev_args, dev_blobs).compile()
        t_compile = _time.perf_counter() - t0 - t_put
        outs = compiled(dev_args, dev_blobs)
        jax.block_until_ready(outs)
        t_exec = _time.perf_counter() - t0 - t_put - t_compile
        print(
            f"materialize: transfer {t_put:.2f}s  finalize-compile {t_compile:.2f}s  "
            f"finalize-exec {t_exec:.2f}s (block_until_ready fences; a tunnel "
            f"backend may defer work to first fetch)"
        )
        produced = iter(outs)
    else:
        produced = iter(jax.jit(finalize, **jit_kwargs)(dev_args, dev_blobs))

    def _fresh_keys(leaf, i):
        # preserve the leaf's key shape — scan-layout modules stack per-depth
        # keys as (depth,) leaves and lax.scan needs that leading axis
        shape = tuple(getattr(leaf, "shape", ()))
        base = jax.random.key(seed + i)
        if not shape:
            return base
        return jax.random.split(base, int(np.prod(shape))).reshape(shape)

    new_leaves = []
    for i, leaf in enumerate(leaves):
        if _is_key(leaf):
            key = _fresh_keys(leaf, i)
            if _shard_for is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                key = jax.device_put(key, NamedSharding(mesh, PartitionSpec()))
            new_leaves.append(key)
        elif i in host_pos or isinstance(leaf, jax.ShapeDtypeStruct):
            new_leaves.append(next(produced))
        else:
            # concrete jax array: already on device, but still honor the
            # param_dtype contract (a partially-eager module would otherwise
            # silently keep mixed dtypes)
            if tgt[i] is not None and getattr(leaf, "dtype", None) != tgt[i]:
                leaf = leaf.astype(tgt[i])
            if _shard_for is not None:
                leaf = jax.device_put(leaf, _shard_for(i))  # re-place on mesh
            new_leaves.append(leaf)
    state = jax.tree.unflatten(treedef, new_leaves)
    return nnx.merge(graphdef, state)


_NSV_MAGIC = b"UNICEPTION_NSV1\n"
_ALIGN = 64


class PackedNativeState(_Mapping):
    """Zero-copy view of a packed ``.nsv`` checkpoint.

    Mapping-compatible (dotted path -> numpy view into one memory map) so
    it drops into every ``arrays=`` call site — but :func:`materialize`
    recognizes it and ships each DTYPE SECTION as one contiguous 1-D
    device buffer (the save format groups tensors by dtype), slicing and
    reshaping per tensor inside the finalize program — ~4 transfer
    dispatches instead of ~900 (BASELINE.md serving cold-start table).
    Per-dtype sections — rather than one byte blob — matter on TPU: a
    byte-level ``(n, itemsize)`` bitcast reshape gets tiled to (8, 128)
    sublanes and inflates HBM 32x (measured 34 GB compile-time OOM);
    1-D native-dtype slices have no such pathology.

    Assigning ``packed[path] = array`` overrides one entry (it then travels
    the per-leaf host path).
    """

    def __init__(self, blobs: dict, index: dict, meta: dict):
        self.blobs = blobs  # dtype name -> contiguous 1-D numpy view of that section
        self.index = index  # path -> (jnp dtype, shape tuple, element offset in its section)
        self.meta = meta
        self.overrides = {}

    def __getitem__(self, k):
        if k in self.overrides:
            return self.overrides[k]
        dt, shape, eoff = self.index[k]
        n = int(np.prod(shape))
        return self.blobs[dt.name][eoff : eoff + n].reshape(shape)

    def __setitem__(self, k, v):
        self.overrides[k] = np.asarray(v)

    def __iter__(self):
        return iter(set(self.index) | set(self.overrides))

    def __len__(self):
        return len(set(self.index) | set(self.overrides))


def _native_leaves(module, dtype):
    "(paths, arrays) of the module's savable state, optionally float-cast."
    _, state = nnx.split(module)
    leaves, _ = jax.tree.flatten(state)
    paths = _state_paths(state)
    out = []
    for p, l in zip(paths, leaves):
        if _is_key(l) or isinstance(l, jax.ShapeDtypeStruct):
            continue
        a = np.asarray(l)
        if dtype is not None and jnp.issubdtype(jnp.dtype(a.dtype), jnp.floating):
            a = a.astype(jnp.dtype(dtype))
        out.append((p, a))
    return out


def save_native_state(path: str, module: nnx.Module, *, dtype=None, **metadata) -> None:
    """Save a module's state in its NATIVE layout (serving checkpoint).

    Unlike :func:`uniception_tpu.utils.checkpoint.save_checkpoint` (the
    torch-layout interchange format), this stores our own kernel layouts
    and scan-stacked leaves keyed by state path — loading needs no
    transpose/stack host work. ``dtype`` optionally pre-casts floating
    leaves at save time (serving: ``jnp.bfloat16`` halves read bytes).

    Two containers by extension:
      * ``.npz``  — zip container, numpy-interchange friendly; python's
        zipfile reads it at ~34 MB/s on a weak host (measured) — fine for
        small models, latency-bound for ViT-L serving.
      * anything else (recommended: ``.nsv``) — packed raw format: JSON
        header + 64-byte-aligned tensor bytes. :func:`load_native_state`
        memory-maps it ZERO-COPY, so the read costs one page-in pass at
        disk bandwidth (1.1 GB/s here, 32x the zip path) and
        :func:`materialize`'s batched device_put streams straight from
        the mapping.
    """
    entries = _native_leaves(module, dtype)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith(".npz"):
        dtypes = {p: jnp.dtype(a.dtype).name for p, a in entries}
        # numpy's .npy writer stores extension dtypes (bf16 et al.) as raw
        # void bytes; record the true dtype so load can view-cast back
        payload = {p: a for p, a in entries}
        payload[_META_KEY] = np.array(
            json.dumps({"format": "native_state", "dtypes": dtypes, **metadata})
        )
        np.savez(path, **payload)
        return

    # group tensors by dtype: the loader then maps each dtype section as ONE
    # contiguous 1-D array of the native dtype, so materialize transfers a
    # handful of buffers and unpacks with plain 1-D slices + reshapes on
    # device (byte-level bitcast decode tiles catastrophically on TPU)
    by_dt = {}
    for p, a in entries:
        by_dt.setdefault(jnp.dtype(a.dtype).name, []).append((p, a))
    sections = {}
    tensors = []
    off = 0
    for dt_name in sorted(by_dt):
        itemsize = jnp.dtype(dt_name).itemsize
        off = (off + _ALIGN - 1) // _ALIGN * _ALIGN
        eoff = 0
        for p, a in by_dt[dt_name]:
            tensors.append({"path": p, "dtype": dt_name, "shape": list(a.shape), "eoff": eoff})
            eoff += int(a.size)
        sections[dt_name] = {"offset": off, "nelems": eoff}
        off += eoff * itemsize
    header = {
        "format": "native_state",
        "layout": "dtype-grouped",
        "sections": sections,
        "tensors": tensors,
        "meta": metadata,
    }
    with open(path, "wb") as f:
        write_framed_header(f, _NSV_MAGIC, header)
        base = f.tell()
        pad = (-base) % _ALIGN
        f.write(b"\0" * pad)
        base += pad
        for dt_name in sorted(by_dt):
            f.seek(base + sections[dt_name]["offset"])
            for _, a in by_dt[dt_name]:
                f.write(np.ascontiguousarray(a).tobytes())


def load_native_state(path: str):
    """Load a :func:`save_native_state` checkpoint.

    Returns (arrays, metadata): pass ``arrays`` to :func:`materialize`.
    Packed (non-.npz) checkpoints come back as a :class:`PackedNativeState`
    (Mapping of zero-copy memory-map views; materialize ships its whole
    tensor region as ONE device buffer and unpacks on device); ``.npz``
    checkpoints come back as a plain dict of arrays.
    """
    if _sniff_nsv(path):
        with open(path, "rb") as f:
            header = read_framed_header(f, _NSV_MAGIC, what="native-state checkpoint")
            base = f.tell()
            base += (-base) % _ALIGN
        mm = np.memmap(path, dtype=np.uint8, mode="r")
        region = mm[base:]
        if header.get("layout") == "dtype-grouped":
            blobs = {}
            for dt_name, sec in header["sections"].items():
                dt = jnp.dtype(dt_name)
                start = int(sec["offset"])
                blobs[dt_name] = region[start : start + int(sec["nelems"]) * dt.itemsize].view(dt)
            index = {
                t["path"]: (jnp.dtype(t["dtype"]), tuple(t["shape"]), int(t["eoff"]))
                for t in header["tensors"]
            }
            return PackedNativeState(blobs, index, header["meta"]), header["meta"]
        # v1 layout (per-tensor byte offsets): plain dict of zero-copy views
        arrays = {}
        for t in header["tensors"]:
            dt = jnp.dtype(t["dtype"])
            n = int(np.prod(t["shape"])) * dt.itemsize
            start = int(t["offset"])
            arrays[t["path"]] = region[start : start + n].view(dt).reshape(t["shape"])
        return arrays, header["meta"]

    with np.load(path, allow_pickle=False) as data:
        if _META_KEY not in data.files:
            raise ValueError(f"{path} is not a native-state checkpoint (use load_checkpoint)")
        header = json.loads(str(data[_META_KEY]))
        dtypes = header.get("dtypes", {})
        arrays = {}
        for k in data.files:
            if k == _META_KEY:
                continue
            a = data[k]
            want = dtypes.get(k)
            if want is not None and a.dtype.name != want:
                a = a.view(jnp.dtype(want))  # void-stored extension dtype (bf16 ...)
            arrays[k] = a
    # same metadata contract as the packed container: user keys only
    meta = {k: v for k, v in header.items() if k not in ("format", "dtypes")}
    return arrays, meta


def _sniff_nsv(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(len(_NSV_MAGIC)) == _NSV_MAGIC
    except OSError:
        return False


def is_native_state(path: str) -> bool:
    "True when ``path`` is a save_native_state serving checkpoint."
    if _sniff_nsv(path):
        return True
    if not path.endswith(".npz"):
        return False
    with np.load(path, allow_pickle=False) as data:
        return _META_KEY in data.files
