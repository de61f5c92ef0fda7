#!/usr/bin/env python
"""
Multi-shape jit smoke test for the DINOv2 encoder.

TPU-native analogue of reference scripts/compile_dinov2.py:13-34 (which
exercised torch.compile over 64 dynamic shapes). XLA recompiles per shape;
this sweeps a bucket of aspect ratios and reports compile + steady-state
time per shape, which is the data you need to pick shape buckets for
production serving.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.encoders import encoder_factory
    from uniception_tpu.models.encoders.base import ViTEncoderInput

    enc = encoder_factory("dinov2", name="dinov2", size="small", rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(enc)

    @jax.jit
    def fwd(state, img):
        m = nnx.merge(graphdef, state)
        return m(ViTEncoderInput(image=img, data_norm_type="dinov2")).features

    shapes = [(14 * a, 14 * b) for a in (16, 24, 32) for b in (16, 24, 32)]
    rng = np.random.RandomState(0)
    for h, w in shapes:
        img = jnp.asarray(rng.randn(1, 3, h, w).astype(np.float32))
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(state, img))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(state, img))
        steady_s = time.perf_counter() - t0
        print(f"  {h}x{w}: compile {compile_s*1e3:8.1f} ms   steady {steady_s*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
