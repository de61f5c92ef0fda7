"""
GPTQ: Hessian-aware error-compensated weight rounding for the int8 path.

The int8 serving bill is WEIGHT-quant dominated (BASELINE.md round 4:
asymmetric activations move the full-model bill only 1.95e-2 -> 1.87e-2).
Round-to-nearest (RTN) per-output-channel rounding — what
``Int8Linear.from_linear`` does — ignores input correlations: rounding
error on input channel j is invisible at the output only if channel j is
uncorrelated with the rest. GPTQ (Frantar et al., 2023) quantizes input
channels one at a time and folds each channel's rounding error into the
not-yet-quantized channels through the inverse Hessian H^-1
(H = sum_x x x^T over a calibration set), which typically halves RTN's
output error at IDENTICAL serving cost: same int8 kernels, same
per-output-channel scales, only better integer codes.

This is an offline transform. Pipeline (scripts/calibrate_gptq.py):
    1. ``install_hessian_capture`` wraps the target ``nnx.Linear`` layers
       with an accumulator module (works under jit via nnx state).
    2. run forwards on calibration batches; ``harvest_hessians`` collects
       per-layer H.
    3. ``gptq_int8`` re-rounds each kernel (numpy/torch host math).
    4. ``apply_gptq`` overwrites the ``w_q`` codes of an
       int8-quantized model — loop layout or the scan/stacked layout
       (loop keys ``blocks.{i}.rest`` map onto the stacked depth axis).

The reference has no quantization story; this extends the TPU-native
int8 serving path (nn/quant.py).
"""

from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.nn.quant import Int8Linear, _maybe_children

__all__ = [
    "HessianState",
    "install_hessian_capture",
    "harvest_hessians",
    "harvest_act_amax",
    "gptq_int8",
    "apply_gptq",
    "load_gptq_npz",
]


def load_gptq_npz(path: str) -> Dict[str, tuple]:
    """Load the ``{path: (w_q, w_scale)}`` dict saved by
    ``scripts/calibrate_gptq.py`` (npz keys ``<path>.w_q`` / ``<path>.w_scale``)."""
    data = np.load(path)
    out: Dict[str, tuple] = {}
    for k in data.files:
        if k.endswith(".w_q"):
            p = k[: -len(".w_q")]
            out[p] = (data[k], data[p + ".w_scale"])
    return out


class HessianState(nnx.Variable):
    "Calibration accumulator (not a Param: never trained or checkpointed)."


class _HessianCapture(nnx.Module):
    "Transparent wrapper accumulating H = sum x x^T over the wrapped Linear's inputs."

    def __init__(self, inner: nnx.Linear):
        self.inner = inner
        d = int(inner.kernel.shape[-2])
        self.h = HessianState(jnp.zeros((d, d), jnp.float32))
        self.n = HessianState(jnp.zeros((), jnp.float32))
        # per-input-channel |x| max over all calibration tokens — the
        # activation statistic SmoothQuant-style scale migration needs
        # (nn/smooth.py); free to carry alongside the Hessian
        self.amax = HessianState(jnp.zeros((d,), jnp.float32))

    def __call__(self, x):
        xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        self.h.value = self.h.value + xf.T @ xf
        self.n.value = self.n.value + jnp.float32(xf.shape[0])
        self.amax.value = jnp.maximum(self.amax.value, jnp.abs(xf).max(axis=0))
        return self.inner(x)


def install_hessian_capture(
    module: nnx.Module,
    *,
    min_params: int = 1 << 16,
    predicate: Optional[Callable[[str, nnx.Linear], bool]] = None,
    _path: str = "",
) -> int:
    """Wrap every target ``nnx.Linear`` under ``module`` (in place, loop
    layout) with a Hessian accumulator. Same selection rules as
    ``quantize_linears``. Returns the number of layers wrapped.

    Run the model functionally afterwards so the accumulators update under
    jit::

        gd, st = nnx.split(model)
        run = jax.jit(lambda st, *a: nnx.split(_fwd(nnx.merge(gd, st), *a))[1])
        st = run(st, batch)   # repeat per calibration batch
        nnx.update(model, st)
    """
    count = 0
    for setter, name, child in _maybe_children(module):
        child_path = f"{_path}.{name}".lstrip(".")
        if isinstance(child, nnx.Linear):
            k = child.kernel[...]
            if k.size >= min_params and (predicate is None or predicate(child_path, child)):
                if k.ndim != 2:
                    # fail loudly instead of silently capturing nothing: a
                    # scan/stacked model would otherwise run a multi-minute
                    # calibration that produces an empty npz
                    raise ValueError(
                        f"install_hessian_capture: {child_path} has a stacked "
                        f"{k.shape} kernel — calibrate on the LOOP layout "
                        "(scan_blocks=False) for per-depth Hessians; apply_gptq "
                        "then maps the loop keys onto stacked models at load"
                    )
                setter(_HessianCapture(child))
                count += 1
        elif isinstance(child, (nnx.Module, list, nnx.List)) and not isinstance(
            child, (Int8Linear, _HessianCapture)
        ):
            count += install_hessian_capture(
                child, min_params=min_params, predicate=predicate, _path=child_path
            )
    return count


def harvest_act_amax(module: nnx.Module, *, _path: str = "") -> Dict[str, np.ndarray]:
    """Collect ``{dotted_path: per-input-channel |x| max}`` from the installed
    capture wrappers WITHOUT unwrapping them (call before
    :func:`harvest_hessians`). Feed to ``nn/smooth.py``'s scale migration."""
    out: Dict[str, np.ndarray] = {}
    for _, name, child in _maybe_children(module):
        child_path = f"{_path}.{name}".lstrip(".")
        if isinstance(child, _HessianCapture):
            out[child_path] = np.asarray(child.amax[...], np.float64)
        elif isinstance(child, (nnx.Module, list, nnx.List)) and not isinstance(child, Int8Linear):
            out.update(harvest_act_amax(child, _path=child_path))
    return out


def harvest_hessians(module: nnx.Module, *, unwrap: bool = True, _path: str = "") -> Dict[str, np.ndarray]:
    """Collect ``{dotted_path: H}`` from every installed capture wrapper
    (H normalized by the token count) and, with ``unwrap=True``, restore
    the original ``nnx.Linear`` modules in place."""
    out: Dict[str, np.ndarray] = {}
    for setter, name, child in _maybe_children(module):
        child_path = f"{_path}.{name}".lstrip(".")
        if isinstance(child, _HessianCapture):
            n = float(child.n[...])
            out[child_path] = np.asarray(child.h[...], np.float64) / max(n, 1.0)
            if unwrap:
                setter(child.inner)
        elif isinstance(child, (nnx.Module, list, nnx.List)) and not isinstance(child, Int8Linear):
            out.update(harvest_hessians(child, unwrap=unwrap, _path=child_path))
    return out


def gptq_int8(
    w: np.ndarray,
    H: np.ndarray,
    *,
    blocksize: int = 128,
    percdamp: float = 0.01,
    dtype=np.float64,
) -> Tuple[np.ndarray, np.ndarray]:
    """GPTQ re-rounding of one kernel ``w`` (in, out) against Hessian ``H``
    (in, in). Returns ``(w_q int8 (in, out), w_scale f32 (1, out))`` on the
    SAME symmetric per-output-channel grid as ``quantize_int8(axis=-2)`` —
    drop-in for ``Int8Linear``'s ``w_q``/``w_scale``.

    Host math (numpy; ``dtype=np.float32`` halves the O(d^3) factorization
    cost — the damping keeps f32 stable and int8 codes are insensitive to
    the last float bits); sequential over input channels in blocks with the
    lazy trailing update, exactly the published GPTQ schedule. With H = I
    the compensation vanishes and the result equals RTN.
    """
    w = np.asarray(w, dtype).copy()
    d_in = w.shape[0]
    assert H.shape == (d_in, d_in), (H.shape, w.shape)
    scale = np.maximum(np.abs(w).max(axis=0, keepdims=True), 1e-30) / 127.0  # (1, out)

    H = np.asarray(H, dtype).copy()
    diag = np.arange(d_in)
    dead = H[diag, diag] <= 0
    H[diag[dead], diag[dead]] = 1.0
    w[dead, :] = 0.0
    H[diag, diag] += percdamp * float(np.mean(H[diag, diag]))

    # U = upper factor with H^-1 = U^T U (the GPTQ factorization: row
    # U[j, k>j] carries exactly the compensation coefficients for channel
    # j). numpy ships lower Cholesky; H^-1 = L L^T gives U = L^T.
    Linv = np.linalg.inv(np.linalg.cholesky(H))
    Hinv = Linv.T @ Linv  # H^-1 from the inverse lower factor
    U = np.ascontiguousarray(np.linalg.cholesky(Hinv).T)

    q_codes = np.zeros_like(w)
    s = scale[0]
    for i0 in range(0, d_in, blocksize):
        i1 = min(i0 + blocksize, d_in)
        Wb = w[i0:i1, :]
        Eb = np.zeros_like(Wb)
        Ub = U[i0:i1, i0:i1]
        for j in range(i1 - i0):
            wj = Wb[j, :]
            q = np.clip(np.round(wj / s), -127, 127)
            q_codes[i0 + j, :] = q
            err = (wj - q * s) / Ub[j, j]
            if j + 1 < i1 - i0:
                Wb[j + 1 :, :] -= np.outer(Ub[j, j + 1 :], err)
            Eb[j, :] = err
        if i1 < d_in:
            w[i1:, :] -= U[i0:i1, i1:].T @ Eb

    return q_codes.astype(np.int8), scale.astype(np.float32)


def _stack_loop_keys(weights: Dict[str, tuple], path: str, depth: int):
    """For a stacked layer at ``path`` (container attr without a depth
    index), gather the loop-layout entries ``head.{i}.tail`` and stack
    along axis 0. The loop key inserts the depth index after the stacked
    container's attribute name — the same convention the scan checkpoint
    mapping uses (nn/scan.py)."""
    for split in range(len(path.split(".")), 0, -1):
        parts = path.split(".")
        head, tail = ".".join(parts[:split]), ".".join(parts[split:])
        keys = [f"{head}.{i}.{tail}".rstrip(".") for i in range(depth)]
        if all(k in weights for k in keys):
            w_q = np.stack([weights[k][0] for k in keys])
            w_s = np.stack([weights[k][1] for k in keys])
            return w_q, w_s
    return None


def apply_gptq(
    module: nnx.Module,
    weights: Dict[str, tuple],
    *,
    _path: str = "",
) -> int:
    """Overwrite the ``w_q``/``w_scale`` of already-quantized
    ``Int8Linear`` layers with GPTQ codes. ``weights`` maps loop-layout
    dotted paths to ``(w_q, w_scale)`` (what ``scripts/calibrate_gptq.py``
    saves). Works on both layouts: for a scan/stacked model the per-depth
    loop entries are stacked onto the (depth, in, out) kernel. Layers with
    no matching entry are left on their RTN codes. Returns the number of
    layers rewritten."""
    count = 0
    for _, name, child in _maybe_children(module):
        child_path = f"{_path}.{name}".lstrip(".")
        if isinstance(child, Int8Linear):
            k = child.w_q[...]
            rewrote = False
            if k.ndim == 3:  # stacked (depth, in, out)
                got = _stack_loop_keys(weights, child_path, int(k.shape[0]))
                if got is not None:
                    assert got[0].shape == k.shape, (child_path, got[0].shape, k.shape)
                    child.w_q[...] = jnp.asarray(got[0])
                    child.w_scale[...] = jnp.asarray(got[1])
                    rewrote = True
            elif child_path in weights:
                w_q, w_s = weights[child_path]
                assert w_q.shape == k.shape, (child_path, w_q.shape, k.shape)
                child.w_q[...] = jnp.asarray(w_q)
                child.w_scale[...] = jnp.asarray(w_s)
                rewrote = True
            if rewrote:
                count += 1
                if getattr(child, "w_colsum", None) is not None:
                    # asym mode precomputes colsum(W_q * s): refresh it
                    child.w_colsum[...] = (
                        child.w_q[...].astype(jnp.int32).sum(axis=-2, keepdims=True).astype(jnp.float32)
                        * child.w_scale[...]
                    )
        elif isinstance(child, (nnx.Module, list, nnx.List)):
            count += apply_gptq(child, weights, _path=child_path)
    return count
