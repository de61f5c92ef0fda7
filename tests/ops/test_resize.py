"""
ops/resize: the NHWC-native interpolate must equal the BCHW path exactly
(same weight matrices), and torch-semantics cases are covered indirectly by
the DPT parity suite (tests/models/test_dpt.py vs torch F.interpolate).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from uniception_tpu.ops.resize import interpolate, interpolate_nhwc


@pytest.mark.parametrize("mode,align", [("bilinear", True), ("bilinear", False), ("bicubic", False), ("nearest", False)])
def test_interpolate_nhwc_matches_bchw(mode, align):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 13, 17, 5).astype(np.float32))  # NHWC
    size = (29, 8)
    ref = jnp.transpose(
        interpolate(jnp.transpose(x, (0, 3, 1, 2)), size=size, mode=mode, align_corners=align), (0, 2, 3, 1)
    )
    out = interpolate_nhwc(x, size=size, mode=mode, align_corners=align)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_interpolate_nhwc_scale_factor():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    ref = jnp.transpose(
        interpolate(jnp.transpose(x, (0, 3, 1, 2)), scale_factor=2, mode="bilinear", align_corners=True), (0, 2, 3, 1)
    )
    out = interpolate_nhwc(x, scale_factor=2, mode="bilinear", align_corners=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
