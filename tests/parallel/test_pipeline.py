"""
Input pipeline: prefetch staging, sharded placement, batch iteration.
"""

import numpy as np
import pytest

import jax

from uniception_tpu.data.pipeline import epoch_batches, normalize_batch, prefetch_to_device
from uniception_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_prefetch_shards_batches():
    mesh = make_mesh(data=8, model=1)
    rng = np.random.RandomState(0)
    data = {"img": rng.randn(32, 3, 8, 8).astype(np.float32), "y": rng.randn(32, 4).astype(np.float32)}

    batches = list(epoch_batches(data, batch_size=8, rng=np.random.RandomState(1)))
    assert len(batches) == 4

    staged = list(prefetch_to_device(batches, mesh=mesh))
    assert len(staged) == 4
    for b in staged:
        assert b["img"].shape == (8, 3, 8, 8)
        assert len(b["img"].sharding.device_set) == 8
    # content preserved
    total_in = np.sort(np.concatenate([np.asarray(b["y"]).ravel() for b in batches]))
    total_out = np.sort(np.concatenate([np.asarray(b["y"]).ravel() for b in staged]))
    np.testing.assert_allclose(total_in, total_out)


def test_normalize_batch():
    imgs = (np.ones((2, 8, 8, 3)) * 127).astype(np.uint8)
    out = normalize_batch(imgs, "dust3r")
    assert out.shape == (2, 3, 8, 8)
    # dust3r norm: (x - 0.5) / 0.5 -> 127/255*2-1 ~ -0.004
    assert abs(out.mean() - (127 / 255 * 2 - 1)) < 1e-5
