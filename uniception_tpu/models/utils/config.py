"""
Global configuration for kernel selection.

TPU-native analogue of the reference's fused-attention switch
(reference: uniception/models/utils/config.py:12-34, env var UNICEPTION_FUSED_ATTN).
Here the switch selects the attention implementation:

    - "xla":    jax.nn.dot_product_attention (XLA fuses this well on TPU)
    - "pallas": custom Pallas flash-attention kernel (TPU only)
    - "naive":  explicit softmax reference implementation (for parity tests)
    - "fused":  Pallas fused qkv-projection+RoPE+attention kernel (TPU only;
                modules fall back to "pallas" where the fused contract does
                not apply — qk_norm, latent attention, exotic PE, huge Nk)

Controlled by env var ``UNICEPTION_TPU_ATTN`` or :func:`set_attention_impl`.
"""

import os
import warnings

__all__ = [
    "get_attention_impl",
    "set_attention_impl",
    "get_attention_quant",
    "set_attention_quant",
    "use_fused_attn",
    "set_fused_attn",
    "get_gelu_mode",
    "set_gelu_mode",
    "get_conv3x3_impl",
    "set_conv3x3_impl",
    "get_fast_init",
    "set_fast_init",
    "fast_init",
]

_VALID_IMPLS = ("xla", "pallas", "naive", "fused")

# default to the Pallas kernel: the dispatch falls back to XLA off-TPU
# automatically (ops/attention.py), so this is the fast path on chip and
# a no-op elsewhere
_ATTN_IMPL = os.environ.get("UNICEPTION_TPU_ATTN", "pallas")
if _ATTN_IMPL not in _VALID_IMPLS:
    warnings.warn(f"Invalid UNICEPTION_TPU_ATTN={_ATTN_IMPL!r}; falling back to 'pallas'")
    _ATTN_IMPL = "pallas"


def get_attention_impl() -> str:
    "Return the currently selected attention implementation."
    return _ATTN_IMPL


def set_attention_impl(impl: str):
    "Select the attention implementation ('xla', 'pallas', 'naive' or 'fused')."
    global _ATTN_IMPL
    if impl not in _VALID_IMPLS:
        raise ValueError(f"Invalid attention impl {impl!r}; must be one of {_VALID_IMPLS}")
    _ATTN_IMPL = impl


# GELU mode: "exact" (erf — bit-parity with torch nn.GELU, the default) or
# "tanh" (the standard TPU production approximation — ~7x cheaper on the VPU,
# ~1e-3 relative activation difference, well inside the reference's 1e-2
# golden gates). Env var UNICEPTION_TPU_GELU or set_gelu_mode().
_GELU_MODE = os.environ.get("UNICEPTION_TPU_GELU", "exact")
if _GELU_MODE not in ("exact", "tanh"):
    warnings.warn(f"Invalid UNICEPTION_TPU_GELU={_GELU_MODE!r}; falling back to 'exact'")
    _GELU_MODE = "exact"


def get_gelu_mode() -> str:
    "Return the current GELU mode ('exact' or 'tanh')."
    return _GELU_MODE


def set_gelu_mode(mode: str):
    "Select the GELU implementation ('exact' for parity, 'tanh' for speed)."
    global _GELU_MODE
    if mode not in ("exact", "tanh"):
        raise ValueError(f"Invalid gelu mode {mode!r}")
    _GELU_MODE = mode


# Attention quantization mode (Pallas flash kernel, inference-only):
#   "none"   — bf16 QK^T and PV (default)
#   "int8"   — int8 QK^T (per-row q / per-block smoothed k scales), bf16 PV
#   "int8pv" — int8 QK^T and int8 PV (p in [0,1] -> fixed 1/127 scale)
# Env var UNICEPTION_TPU_ATTN_QUANT or set_attention_quant(). Applies only
# to the single-k-step inference kernel; training (lse path) stays bf16.
_ATTN_QUANT = os.environ.get("UNICEPTION_TPU_ATTN_QUANT", "none")
if _ATTN_QUANT not in ("none", "int8", "int8pv"):
    warnings.warn(f"Invalid UNICEPTION_TPU_ATTN_QUANT={_ATTN_QUANT!r}; falling back to 'none'")
    _ATTN_QUANT = "none"


def get_attention_quant() -> str:
    "Return the attention quantization mode ('none', 'int8' or 'int8pv')."
    return _ATTN_QUANT


def set_attention_quant(mode: str):
    "Select the attention quantization mode ('none', 'int8' or 'int8pv')."
    global _ATTN_QUANT
    if mode not in ("none", "int8", "int8pv"):
        raise ValueError(f"Invalid attention quant mode {mode!r}")
    _ATTN_QUANT = mode


# 3x3 conv lowering for the DPT-head hot shapes (ops/conv3x3.py):
#   "xla"    — stock conv lowering (default)
#   "pallas" — Pallas 9-tap matmul kernel. Isolated microbenches win for
#              bf16 at <=256² spatial (fusion@128²: 175 vs 125 TF/s,
#              conv1@256²: +13%), but measured e2e on the dpt config it is
#              NET SLOWER (45.4 vs 48.1 pairs/s — the host-side overlap
#              tiling copy and XLA<->Pallas layout transitions eat the
#              gain), so "xla" stays the default; the knob exists for
#              shape regimes where the microbench win scales.
# Env var UNICEPTION_TPU_CONV3X3 or set_conv3x3_impl().
_CONV3X3_IMPL = os.environ.get("UNICEPTION_TPU_CONV3X3", "xla")
if _CONV3X3_IMPL not in ("xla", "pallas"):
    warnings.warn(f"Invalid UNICEPTION_TPU_CONV3X3={_CONV3X3_IMPL!r}; falling back to 'xla'")
    _CONV3X3_IMPL = "xla"


def get_conv3x3_impl() -> str:
    "Return the 3x3-conv lowering ('xla' or 'pallas')."
    return _CONV3X3_IMPL


def set_conv3x3_impl(impl: str):
    "Select the 3x3-conv lowering ('xla' or 'pallas')."
    global _CONV3X3_IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(f"Invalid conv3x3 impl {impl!r}")
    _CONV3X3_IMPL = impl


# --- reference-API compatibility shims (uniception/models/utils/config.py:20-34) ---


def use_fused_attn() -> bool:
    "True when a fused (non-naive) attention implementation is selected."
    return _ATTN_IMPL != "naive"


def set_fused_attn(enable: bool = True):
    "Enable (xla) or disable (naive) fused attention, mirroring the reference API."
    set_attention_impl("xla" if enable else "naive")


# Fast (deferred) initialization: skip the expensive random param init when
# the weights will immediately be overwritten by a checkpoint load — the
# serving cold-start path. Construction profiling (round 3) showed ~65% of
# the scan-layout DUSt3R construct time is eager PRNG work inside
# xavier-uniform / trunc-normal initializers; with fast init those params
# are zero-filled (an XLA constant, no PRNG) and construction drops
# accordingly. NEVER use for training-from-scratch (zeros break symmetry
# breaking); pair it with a pretrained_checkpoint_path or an explicit
# load_torch_state_dict / restore.
# Env var UNICEPTION_TPU_FAST_INIT=1 or set_fast_init(True).
_FAST_INIT = os.environ.get("UNICEPTION_TPU_FAST_INIT", "0") == "1"


def get_fast_init() -> bool:
    "True when fast (zeros) param init is enabled (checkpoint-loading path)."
    return _FAST_INIT


def set_fast_init(enable: bool = True):
    "Enable/disable fast zeros init for checkpoint-loading construction."
    global _FAST_INIT
    _FAST_INIT = bool(enable)


class fast_init:
    "Context manager: construct models with zeros init (then load weights)."

    def __init__(self, enable: bool = True):
        self.enable = enable

    def __enter__(self):
        global _FAST_INIT
        self.prev = _FAST_INIT
        _FAST_INIT = self.enable
        return self

    def __exit__(self, *exc):
        global _FAST_INIT
        _FAST_INIT = self.prev
        return False
