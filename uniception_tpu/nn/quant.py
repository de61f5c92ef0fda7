"""
Int8 serving path: w8a8 dynamic-quantized linear layers.

TPU v5e executes int8 x int8 -> int32 matmuls on the MXU at 2x the bf16
rate (394.7 vs 197.4 TOPS), and the projections (qkv / proj / mlp) carry
~86% of a ViT block's FLOPs — so quantizing only the nn.Linear layers
(attention math stays bf16 in the Pallas kernel) buys most of the int8
headroom while keeping softmax/normalization numerics intact.

Scheme (standard "SmoothQuant-free" dynamic w8a8):
    * weights:     symmetric per-output-channel int8,
                   scale_j = max_i |W[i, j]| / 127
    * activations: symmetric per-token (per row) int8, computed on the fly,
                   scale_t = max_c |x[t, c]| / 127
    * y = (x_q @ W_q) * (scale_t * scale_j) + b      (int32 accumulation)

The reference has no quantization story (pure fp32/autocast torch,
uniception/models/factory/dust3r.py:309); this is a TPU-native serving
extension. Accuracy is gated by tests/nn/test_quant.py against the
reference's own golden thresholds (abs < 1e-2, rel < 1e-3 — see
/root/reference/examples/models/dust3r/dust3r.py:223-230).
"""

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = [
    "Int8Linear",
    "quantize_linears",
    "quantize_int8",
    "force_xla_int8",
    "quantize_trunk",
    "trunk_policy",
]

# Process-wide correctness override: pallas_call does not SPMD-partition,
# so sharded inference (dp or tp meshes, parallel/inference.py) must pin
# Int8Linear to the XLA lowering, which GSPMD partitions. Wins over the
# env var — including an explicit "pallas" — because routing a sharded
# operand into the Pallas kernel is wrong (replicates/all-gathers), not
# just slow.
_FORCE_XLA = False


def force_xla_int8(on: bool = True) -> None:
    "Pin every Int8Linear in this process to the XLA int8 matmul lowering."
    global _FORCE_XLA
    _FORCE_XLA = on


def _use_pallas_int8(in_features: int) -> bool:
    "Shape-gated Pallas int8-matmul routing (see Int8Linear.__call__)."
    mode = os.environ.get("UNICEPTION_TPU_INT8_MATMUL", "auto")
    if _FORCE_XLA or mode == "xla":
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not (on_tpu or os.environ.get("UNICEPTION_TPU_PALLAS_INTERPRET") == "1"):
        return False
    return mode == "pallas" or in_features >= 4096


def quantize_int8(w: jnp.ndarray, axis: int = 0):
    """Symmetric int8 quantization of ``w`` per channel along ``axis``.

    Returns (w_q int8, scale f32) with ``w ~= w_q * scale`` (scale broadcast
    along ``axis``).
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


class Int8Linear(nnx.Module):
    """Drop-in inference replacement for ``nnx.Linear`` with int8 weights
    and dynamic per-token int8 activations (int32 MXU accumulation).

    Build with :meth:`from_linear`; not meant to be trained (no STE).
    """

    def __init__(
        self,
        w_q: jnp.ndarray,
        w_scale: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        a_scale: Optional[jnp.ndarray] = None,
        w_colsum: Optional[jnp.ndarray] = None,
    ):
        self.w_q = nnx.Param(w_q)  # (in, out) int8 — or (depth, in, out) when depth-stacked
        self.w_scale = nnx.Param(w_scale)  # (1, out) f32 — or (depth, 1, out)
        self.bias = nnx.Param(bias) if bias is not None else None
        self.in_features = int(w_q.shape[-2])
        self.out_features = int(w_q.shape[-1])
        # static-activation-scale mode (w8a8-static): a per-tensor input
        # scale (produced by the user's offline calibration, e.g.
        # max|x|/127 over a calibration set) replaces the per-token
        # abs-max. () f32 when set; None = dynamic (the default — measured
        # as fast as static on v5e, see BASELINE.md).
        self.a_scale = nnx.Param(jnp.asarray(a_scale, jnp.float32)) if a_scale is not None else None
        # asymmetric-activation mode: per-token ZERO-POINT quantization.
        # x = m + (x - m) with m = (max + min)/2 per token; the centered
        # residual uses the full int8 range, which HALVES the activation
        # quantization error for one-sided distributions (the GELU output
        # feeding fc2 — the dominant term of the trunk's int8 bill, measured
        # in BASELINE.md round 4). The exact algebraic correction
        # m * colsum(W_q * w_scale) is a rank-1 epilogue using this
        # precomputed (1, out) vector. None = classic symmetric absmax.
        self.w_colsum = nnx.Param(w_colsum) if w_colsum is not None else None

    @classmethod
    def from_linear(cls, lin: nnx.Linear, asym: Optional[bool] = None) -> "Int8Linear":
        # axis=-2 is the input-features axis for both a plain (in, out)
        # kernel and a depth-stacked (depth, in, out) one (nn/scan.py);
        # a lax.scan over the stacked layout slices axis 0, handing
        # __call__ the same per-step (in, out) int8 + (1, out) scale views.
        w_q, w_scale = quantize_int8(lin.kernel[...], axis=-2)
        bias = lin.bias[...].astype(jnp.float32) if lin.bias is not None else None
        if asym is None:
            asym = os.environ.get("UNICEPTION_TPU_INT8_ASYM", "0") == "1"
        w_colsum = None
        if asym:
            w_colsum = (w_q.astype(jnp.int32).sum(axis=-2, keepdims=True).astype(jnp.float32) * w_scale)
        return cls(w_q, w_scale, bias, w_colsum=w_colsum)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        if self.a_scale is None and self.w_colsum is None and _use_pallas_int8(self.in_features):
            # wide-K shapes (fc2-like, K>=4096): the Pallas kernel with the
            # dynamic quant fused in-kernel measures 31% faster than the
            # XLA lowering (456 vs 312 TOP/s, scripts/bench_int8_matmul.py,
            # BASELINE.md round 3); narrow-K shapes stay on XLA (it wins
            # there). UNICEPTION_TPU_INT8_MATMUL=xla|pallas|auto overrides.
            from uniception_tpu.ops.int8_matmul import int8_matmul_dynamic

            return int8_matmul_dynamic(
                x,
                self.w_q[...],
                self.w_scale[...],  # the op casts scales to f32 itself
                self.bias[...] if self.bias is not None else None,
                out_dtype=orig_dtype,
            )
        xf = x.astype(jnp.float32)
        m = None
        if self.a_scale is not None:
            a_scale = self.a_scale[...]  # () static, frozen at calibration
        elif self.w_colsum is not None:
            # zero-point mode: center each token into the full int8 range
            mx = jnp.max(xf, axis=-1, keepdims=True)
            mn = jnp.min(xf, axis=-1, keepdims=True)
            m = (mx + mn) * 0.5
            a_scale = jnp.maximum((mx - mn) * 0.5, 1e-30) / 127.0
            xf = xf - m
        else:
            a_scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-30) / 127.0
        x_q = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            x_q,
            self.w_q[...],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (a_scale * self.w_scale[...])
        if m is not None:
            # exact identity: x @ Wq*s = (x - m) @ Wq*s + m * colsum(Wq*s)
            y = y + m * self.w_colsum[...]
        if self.bias is not None:
            y = y + self.bias[...]
        return y.astype(orig_dtype)


def _maybe_children(node):
    "Yield (setter, name, child) triples for nnx.Module attributes and list items."
    if isinstance(node, nnx.Module):
        for name, value in list(vars(node).items()):
            yield (lambda v, n=node, a=name: setattr(n, a, v)), name, value
    elif isinstance(node, (list, nnx.List)):
        for i, value in enumerate(list(node)):
            yield (lambda v, n=node, j=i: n.__setitem__(j, v)), str(i), value


def trunk_policy(spec: str):
    """Parse a mixed-precision trunk policy into (enc_pred, dec_pred)
    predicates for :func:`quantize_linears`.

    Grammar: ``"all"`` | ``"none"`` | comma list of ``scope.layer`` where
    scope is ``enc`` / ``dec`` / ``*`` and layer is one of ``qkv``,
    ``proj`` (self-attn out-proj), ``cross`` (all cross-attn projections),
    ``fc1``, ``fc2``, ``mlp`` (= fc1+fc2), ``*``. Examples::

        "all"                       # every trunk linear (the round-2 default)
        "enc.*"                     # encoder int8, decoder bf16
        "*.mlp"                     # fc1+fc2 everywhere, attention projs bf16
        "enc.*,dec.fc1,dec.fc2"     # full encoder + decoder MLPs

    Depth-uniform by construction, so every policy composes with the
    scan-over-stacked-blocks layout (one stacked Int8Linear per layer type).
    Measured (error, throughput) points for the named policies live in
    BASELINE.md round 4 (scripts/sweep_quant_policy.py).
    """
    spec = (spec or "all").strip()
    if spec == "all":
        return (lambda p, l: True), (lambda p, l: True)
    if spec == "none":
        return (lambda p, l: False), (lambda p, l: False)

    _LAYER_SUBSTR = {
        "qkv": ("attn.qkv",),
        "proj": ("attn.proj",),  # matches self-attn out-proj, not cross (below)
        "cross": ("cross_attn.",),
        "fc1": ("mlp.fc1",),
        "fc2": ("mlp.fc2",),
        "mlp": ("mlp.fc1", "mlp.fc2"),
    }
    rules = []
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        try:
            scope, layer = item.split(".", 1)
        except ValueError as e:
            raise ValueError(f"bad policy item {item!r}: expected scope.layer") from e
        if scope not in ("enc", "dec", "*"):
            raise ValueError(f"bad policy scope {scope!r} in {item!r}")
        if layer != "*" and layer not in _LAYER_SUBSTR:
            raise ValueError(f"bad policy layer {layer!r} in {item!r} (one of {sorted(_LAYER_SUBSTR)})")
        rules.append((scope, layer))

    def _pred(component):
        def pred(path, _lin):
            for scope, layer in rules:
                if scope not in ("*", component):
                    continue
                if layer == "*":
                    return True
                subs = _LAYER_SUBSTR[layer]
                # "proj" must not swallow cross_attn.proj* — cross has its own token
                if layer == "proj" and "cross_attn." in path:
                    continue
                if any(s in path for s in subs):
                    return True
            return False

        return pred

    return _pred("enc"), _pred("dec")


def quantize_trunk(
    model: nnx.Module,
    policy: str = "all",
    *,
    asym: Optional[str] = None,
    min_params: int = 1 << 16,
) -> int:
    """Quantize a DUSt3R-style model's trunk (``model.encoder`` +
    ``model.info_sharing``) under a named mixed-precision policy (see
    :func:`trunk_policy`). Returns the number of converted linears.

    asym: a second policy spec selecting WHICH quantized layers use the
        zero-point (asymmetric-activation) mode. Default: the
        ``UNICEPTION_TPU_INT8_ASYM_POLICY`` env var, falling back to
        ``"none"`` (all symmetric): asym on fc2 halves that layer's
        activation error in isolation, but the full-model bill is
        weight-quant dominated (1.95e-2 -> 1.88e-2 at torch init) while
        costing 3.5% throughput (min/max VPU work + losing the Pallas
        wide-K route) — measured frontier in BASELINE.md round 4.
    """
    if asym is None:
        # the boolean UNICEPTION_TPU_INT8_ASYM=1 knob (documented on
        # from_linear) maps to the "all" policy here so it works on the
        # production quantize_trunk path too, not only on direct
        # quantize_linears calls; the POLICY spelling wins when both are set
        fallback = "all" if os.environ.get("UNICEPTION_TPU_INT8_ASYM") == "1" else "none"
        asym = os.environ.get("UNICEPTION_TPU_INT8_ASYM_POLICY", fallback)
    enc_pred, dec_pred = trunk_policy(policy)
    enc_asym, dec_asym = trunk_policy(asym)
    n = quantize_linears(model.encoder, min_params=min_params, predicate=enc_pred, asym=enc_asym)
    n += quantize_linears(model.info_sharing, min_params=min_params, predicate=dec_pred, asym=dec_asym)
    return n


def quantize_linears(
    module: nnx.Module,
    *,
    min_params: int = 1 << 16,
    predicate: Optional[Callable[[str, nnx.Linear], bool]] = None,
    asym: Optional[Callable[[str, nnx.Linear], bool]] = None,
    _path: str = "",
) -> int:
    """Replace every large ``nnx.Linear`` under ``module`` (in place) with an
    :class:`Int8Linear`. Returns the number of layers converted.

    min_params: skip layers with fewer kernel elements (tiny layers gain
        nothing and lose accuracy).
    predicate: optional ``(dotted_path, linear) -> bool`` filter applied on
        top of the size threshold.
    asym: optional per-layer ``(dotted_path, linear) -> bool`` selecting the
        zero-point activation mode; None falls back to the
        ``UNICEPTION_TPU_INT8_ASYM`` process-wide default in ``from_linear``.
    """
    count = 0
    for setter, name, child in _maybe_children(module):
        child_path = f"{_path}.{name}".lstrip(".")
        if isinstance(child, nnx.Linear):
            k = child.kernel[...]
            if k.size >= min_params and (predicate is None or predicate(child_path, child)):
                setter(Int8Linear.from_linear(child, asym=None if asym is None else asym(child_path, child)))
                count += 1
        elif isinstance(child, (nnx.Module, list, nnx.List)) and not isinstance(child, Int8Linear):
            count += quantize_linears(
                child, min_params=min_params, predicate=predicate, asym=asym, _path=child_path
            )
    return count
