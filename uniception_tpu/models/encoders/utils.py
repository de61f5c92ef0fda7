"""
Encoder profiling utilities (path parity with reference
uniception/models/encoders/utils.py:11-86; implementation lives in
uniception_tpu/utils/profile.py).
"""

from uniception_tpu.utils.profile import benchmark_fn, benchmark_fn_chained, flops_of, profile_encoder, trace

__all__ = ["profile_encoder", "benchmark_fn", "benchmark_fn_chained", "flops_of", "trace"]
