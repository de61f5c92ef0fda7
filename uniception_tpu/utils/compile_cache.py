"""
Persistent XLA compilation cache for serving cold-starts.

The reference has no compile step at all (eager torch executes op by op);
on TPU every jitted program pays an XLA compile on first call — 5.3 s for
the scan-layout DUSt3R forward on this backend, plus ~2 s for the
cold-start finalize program (BASELINE.md compile table), and far more
through a remote-compile helper. All of it is deterministic work keyed by
the HLO, so a serving process RESTART should never pay it twice: JAX's
persistent compilation cache memoizes compiled executables on disk keyed
by (HLO, compile options, backend version). This module is the one-call
switch that configures it for serving:

    from uniception_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache("/var/cache/uniception-xla")
    ... jit as usual; warm restarts skip XLA entirely ...

Must be called BEFORE the first jit compilation (cached entries written
after the fact are still picked up by later processes, but calls compiled
before enabling are not cached). Safe to call more than once.

`examples/serve_dust3r.py --compile-cache DIR` and
`scripts/bench_coldstart.py --compile-cache DIR` wire this into the
serving path; measured effect in BASELINE.md (serving cold-start table).
"""

import os
from typing import Optional

__all__ = ["enable_compilation_cache", "cache_entries"]


def enable_compilation_cache(
    cache_dir: str,
    *,
    min_compile_time_secs: float = 0.0,
    max_size_bytes: Optional[int] = None,
) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    min_compile_time_secs: only persist compilations slower than this
        (default 0.0: persist everything — a serving process has few,
        large programs and every skipped compile counts).
    max_size_bytes: optional LRU bound on the cache directory.

    Returns the absolute cache directory (created if missing).
    """
    import jax

    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_time_secs)
    # default threshold skips small programs (e.g. the cold-start finalize
    # unpack); serving wants those cached too
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        # also persist XLA-internal (autotune etc.) caches where supported
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass  # knob absent/renamed on this jax version: the main cache still works
    return cache_dir


def cache_entries(cache_dir: str) -> int:
    "Number of persisted executables in ``cache_dir`` (diagnostics/tests)."
    if not os.path.isdir(cache_dir):
        return 0
    n = 0
    for root, _, files in os.walk(cache_dir):
        n += sum(1 for f in files if not f.startswith("."))
    return n
