"""
Profiling / benchmarking helpers.

TPU-native analogues of the reference's harnesses:
    * benchmark_fn           <- uniception/utils/profile.py:4-13
      (torch.utils.benchmark -> block_until_ready timing)
    * benchmark_fn_chained   — scan-chained on-device timing that excludes
      host<->device transfer latency (essential on tunneled TPU setups where
      a single fetch costs ~100 ms).
    * profile_encoder        <- uniception/models/encoders/utils.py:11-86
      (warmup + timed runs + trace dump instead of CUDA events)
    * flops_of               — jit cost analysis (replaces torch profiler
      FLOP counting).
"""

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["benchmark_fn", "benchmark_fn_chained", "profile_encoder", "flops_of", "trace"]


def benchmark_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3, **kwargs) -> float:
    "Mean wall-clock seconds per call (block_until_ready)."
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def benchmark_fn_chained(fn: Callable, *args, iters: int = 10, trials: int = 3) -> float:
    """Pure device seconds per call via two-length lax.scan chaining.

    ``fn(*args, carry)`` must return a float32 scalar that the next
    iteration's carry consumes (preventing loop-invariant hoisting).
    """

    def make(n):
        @jax.jit
        def many(*a):
            def body(c, _):
                return fn(*a, c).astype(jnp.float32), None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return s

        return many

    short, long = make(2), make(2 + iters)
    float(short(*args))
    float(long(*args))
    ts, tl = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(short(*args))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(long(*args))
        tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / iters


def flops_of(fn: Callable, *args) -> Optional[float]:
    "Analyzed FLOPs of a jitted callable (XLA cost analysis)."
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


class trace:
    "Context manager writing a jax.profiler trace for TensorBoard."

    def __init__(self, logdir: str = "/tmp/uniception_tpu_trace"):
        self.logdir = logdir

    def __enter__(self):
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False


def profile_encoder(
    encoder_call: Callable,
    example_input,
    iters: int = 20,
    warmup: int = 3,
    with_backward: bool = False,
    label: str = "encoder",
):
    """Print fwd (and optional grad) latency stats, reference-style.

    encoder_call must be a pure function of `example_input` (already
    closed over params), returning an array or pytree.
    """
    fwd = jax.jit(lambda x: encoder_call(x))
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(example_input))
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    times_ms = np.asarray(times) * 1e3
    print(f"[{label}] forward: {times_ms.mean():.2f} +- {times_ms.std():.2f} ms over {iters} runs")

    if with_backward:
        grad_fn = jax.jit(jax.grad(lambda x: jnp.sum(jnp.asarray(jax.tree.leaves(encoder_call(x))[0]) ** 2)))
        gtimes = []
        for i in range(warmup + iters):
            t0 = time.perf_counter()
            jax.block_until_ready(grad_fn(example_input))
            if i >= warmup:
                gtimes.append(time.perf_counter() - t0)
        gt = np.asarray(gtimes) * 1e3
        print(f"[{label}] fwd+bwd: {gt.mean():.2f} +- {gt.std():.2f} ms over {iters} runs")
    return times_ms
