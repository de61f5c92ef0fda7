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


def test_native_preprocess_matches_numpy():
    from uniception_tpu.models.encoders.image_normalizations import normalize_image
    from uniception_tpu.native import load_preprocess

    lib = load_preprocess()
    if lib is None:
        pytest.skip("no C++ compiler available")

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(3, 17, 23, 3), dtype=np.uint8)
    native = normalize_batch(imgs, "croco")
    ref = normalize_image(imgs.astype(np.float32).transpose(0, 3, 1, 2) / 255.0, "croco")
    assert native.shape == (3, 3, 17, 23)
    np.testing.assert_allclose(native, np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_native_preprocess_speed():
    "Native path must not be slower than numpy (sanity, generous margin)."
    import time

    from uniception_tpu.native import load_preprocess

    if load_preprocess() is None:
        pytest.skip("no C++ compiler available")
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(8, 512, 512, 3), dtype=np.uint8)
    normalize_batch(imgs, "dust3r")  # warm (compiles lib on first call)
    t0 = time.perf_counter()
    for _ in range(5):
        normalize_batch(imgs, "dust3r")
    native_t = time.perf_counter() - t0

    from uniception_tpu.models.encoders.image_normalizations import normalize_image

    t0 = time.perf_counter()
    for _ in range(5):
        normalize_image(imgs.astype(np.float32).transpose(0, 3, 1, 2) / 255.0, "dust3r").astype(np.float32)
    numpy_t = time.perf_counter() - t0
    print(f"native {native_t*200:.1f}ms/batch numpy {numpy_t*200:.1f}ms/batch")
    assert native_t < numpy_t * 1.5


def test_deterministic_sampler_resumes_exactly():
    """DeterministicSampler: batch k is a pure function of (seed, k) — a
    sampler restarted at step k replays the uninterrupted stream exactly,
    across epoch boundaries; different epochs reshuffle; different seeds
    differ."""
    import itertools

    from uniception_tpu.data.pipeline import DeterministicSampler

    data = {"x": np.arange(20 * 3).reshape(20, 3), "y": np.arange(20)}
    mk = lambda start: DeterministicSampler(data, 4, seed=7, start_step=start)
    full = list(itertools.islice(iter(mk(0)), 12))  # 12 steps = 2.4 epochs (5 bpe)

    resumed = list(itertools.islice(iter(mk(6)), 6))  # restart mid-epoch-1
    for a, b in zip(full[6:], resumed):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["y"], b["y"])

    # epochs reshuffle (first batch of epoch 0 vs epoch 1 differ)
    assert not np.array_equal(full[0]["y"], full[5]["y"])
    # every epoch is a permutation: epoch 1's batches cover 20 of the ids
    epoch1 = np.concatenate([b["y"] for b in full[5:10]])
    np.testing.assert_array_equal(np.sort(epoch1), np.arange(20))
    # a different seed gives a different stream
    other = next(iter(DeterministicSampler(data, 4, seed=8)))
    assert not np.array_equal(other["y"], full[0]["y"])
