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

__all__ = ["Int8Linear", "quantize_linears", "quantize_int8", "force_xla_int8"]

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

    @classmethod
    def from_linear(cls, lin: nnx.Linear) -> "Int8Linear":
        # axis=-2 is the input-features axis for both a plain (in, out)
        # kernel and a depth-stacked (depth, in, out) one (nn/scan.py);
        # a lax.scan over the stacked layout slices axis 0, handing
        # __call__ the same per-step (in, out) int8 + (1, out) scale views.
        w_q, w_scale = quantize_int8(lin.kernel[...], axis=-2)
        bias = lin.bias[...].astype(jnp.float32) if lin.bias is not None else None
        return cls(w_q, w_scale, bias)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        if self.a_scale is None and _use_pallas_int8(self.in_features):
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
        if self.a_scale is not None:
            a_scale = self.a_scale[...]  # () static, frozen at calibration
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


def quantize_linears(
    module: nnx.Module,
    *,
    min_params: int = 1 << 16,
    predicate: Optional[Callable[[str, nnx.Linear], bool]] = None,
    _path: str = "",
) -> int:
    """Replace every large ``nnx.Linear`` under ``module`` (in place) with an
    :class:`Int8Linear`. Returns the number of layers converted.

    min_params: skip layers with fewer kernel elements (tiny layers gain
        nothing and lose accuracy).
    predicate: optional ``(dotted_path, linear) -> bool`` filter applied on
        top of the size threshold.
    """
    count = 0
    for setter, name, child in _maybe_children(module):
        child_path = f"{_path}.{name}".lstrip(".")
        if isinstance(child, nnx.Linear):
            k = child.kernel[...]
            if k.size >= min_params and (predicate is None or predicate(child_path, child)):
                setter(Int8Linear.from_linear(child))
                count += 1
        elif isinstance(child, (nnx.Module, list, nnx.List)) and not isinstance(child, Int8Linear):
            count += quantize_linears(child, min_params=min_params, predicate=predicate, _path=child_path)
    return count
