"""
Size bucketing: arbitrary input resolutions -> a fixed set of compiled
canvases (SURVEY.md "hard parts": the reference accepts any H, W divisible
by the patch size because torch re-specializes per shape; the TPU-native
answer is aspect bucketing so each served shape compiles exactly once).
"""

import numpy as np
import pytest

from uniception_tpu.data.bucketing import (
    DUST3R_512_BUCKETS,
    BucketedBatcher,
    assign_bucket,
    extract_view,
    resize_to_bucket,
)


def test_assign_bucket_aspects():
    # 4:3 landscape -> (384, 512)
    assert assign_bucket(768, 1024) == (0, False)
    # same image rotated: same bucket, flagged portrait
    assert assign_bucket(1024, 768) == (0, True)
    # panoramic -> the widest canvas (160, 512)
    assert assign_bucket(400, 1600) == (len(DUST3R_512_BUCKETS) - 1, False)
    # square: nearest aspect is 4:3
    assert assign_bucket(500, 500) == (0, False)


def test_assign_bucket_validates():
    with pytest.raises(ValueError):
        assign_bucket(0, 10)
    with pytest.raises(ValueError):
        assign_bucket(10, 10, [(512, 384)])  # portrait canvas is not allowed


def test_resize_to_bucket_landscape_and_portrait():
    # smooth gradient: PIL's separable bicubic rounds to uint8 between the
    # horizontal and vertical passes, so transpose-equivariance only holds
    # (to ~1 LSB) on content without pixel-level noise
    yy, xx = np.mgrid[0:300, 0:400]
    img = np.stack([yy * 255 // 299, xx * 255 // 399, (yy + xx) * 255 // 698], -1).astype(np.uint8)
    canvas, ts = resize_to_bucket(img, (384, 512))
    assert canvas.shape == (384, 512, 3) and canvas.dtype == np.uint8
    assert tuple(ts) == (384, 512)

    port = np.swapaxes(img, 0, 1)  # (400, 300, 3) native portrait
    canvas_p, ts_p = resize_to_bucket(port, (384, 512), portrait=True)
    assert canvas_p.shape == (384, 512, 3)
    assert tuple(ts_p) == (512, 384)
    # the canvas holds the TRANSPOSED native-orientation resize; extract_view
    # (the ManyAR unpack helper) recovers the portrait layout
    native = extract_view(canvas_p, ts_p)
    assert native.shape == (512, 384, 3)
    # and it matches the landscape resize of the transposed image (PIL's
    # separable bicubic rounds between passes, so equivariance is approximate)
    diff = native.astype(np.int32) - np.swapaxes(canvas, 0, 1).astype(np.int32)
    assert np.abs(diff).max() <= 2, np.abs(diff).max()


def test_batcher_groups_pads_and_keys():
    rng = np.random.RandomState(0)
    b = BucketedBatcher(2, buckets=((32, 48), (32, 32)))
    # aspect 1.5 -> bucket 0; ~1.0 -> bucket 1; (150, 100) is portrait 1.5
    sizes = [(100, 150), (150, 100), (97, 99), (64, 96), (50, 50)]
    emitted = []
    for i, (h, w) in enumerate(sizes):
        emitted += list(b.add(rng.randint(0, 256, (h, w, 3), np.uint8), key=i))
    emitted += list(b.flush())

    assert len(emitted) == 3
    (bk0, canvas0, ts0, meta0), (bk1, canvas1, ts1, meta1), (bk2, canvas2, ts2, meta2) = emitted

    # first full batch: the two 1.5-aspect images, one of them portrait
    assert bk0 == (32, 48) and canvas0.shape == (2, 32, 48, 3)
    assert meta0 == {"keys": [0, 1], "n_valid": 2}
    np.testing.assert_array_equal(ts0, [[32, 48], [48, 32]])

    # second full batch: the two square-ish images
    assert bk1 == (32, 32) and meta1 == {"keys": [2, 4], "n_valid": 2}
    np.testing.assert_array_equal(ts1, [[32, 32], [32, 32]])

    # flush: the leftover 1.5-aspect image, padded by repeating the last row's
    # pixels — but the padded row carries key=None so key->result maps can't
    # double-deliver
    assert bk2 == (32, 48) and meta2 == {"keys": [3, None], "n_valid": 1}
    np.testing.assert_array_equal(canvas2[0], canvas2[1])


@pytest.mark.slow
def test_bucketed_serving_matches_per_sample_runs():
    """End-to-end plumbing: a mixed-size mixed-orientation stream through the
    batcher, per-bucket forward of a landscape_only DUSt3R, and every valid
    extract_view'd row equals the same canvas served alone."""
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R

    buckets = ((32, 48), (32, 32))
    models = {}
    for hw in buckets:
        # params are shape-independent of img_size; same seed = same weights
        models[hw] = DUSt3R(
            name="bucket_test", img_size=hw, patch_embed_cls="ManyAR_PatchEmbed",
            landscape_only=True, enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
            info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
            rngs=nnx.Rngs(0),
        )

    rng = np.random.RandomState(1)
    sizes = [(100, 150), (150, 100), (97, 99), (50, 50)]
    b = BucketedBatcher(2, buckets=buckets)
    emitted = []
    for i, (h, w) in enumerate(sizes):
        emitted += list(b.add(rng.randint(0, 256, (h, w, 3), np.uint8), key=i))
    emitted += list(b.flush())
    assert len(emitted) == 2

    for bucket_hw, canvas, ts, meta in emitted:
        m = models[bucket_hw]
        x = jnp.asarray(np.transpose(canvas, (0, 3, 1, 2)).astype(np.float32) / 255.0)
        tsj = jnp.asarray(ts)
        res1, _ = m.forward_pair(x, x, true_shape1=tsj, true_shape2=tsj)
        for row in range(meta["n_valid"]):
            r1, _ = m.forward_pair(
                x[row : row + 1], x[row : row + 1],
                true_shape1=tsj[row : row + 1], true_shape2=tsj[row : row + 1],
            )
            np.testing.assert_allclose(
                np.asarray(res1["pts3d"][row]), np.asarray(r1["pts3d"][0]), rtol=1e-5, atol=1e-5
            )
            # native orientation comes back via the ManyAR unpack helper
            native = extract_view(np.asarray(res1["pts3d"][row]), ts[row])
            assert native.shape[:2] == (int(ts[row][0]), int(ts[row][1]))


def test_pair_batcher_groups_by_first_view_and_pads():
    from uniception_tpu.data.bucketing import PairBucketedBatcher

    rng = np.random.RandomState(2)
    b = PairBucketedBatcher(2, buckets=((32, 48), (32, 32)))
    # pair 0: 1.5-aspect landscape + PORTRAIT second view (same canvas, own true_shape)
    # pair 1: square-ish; pair 2: 1.5-aspect (completes bucket 0 with pair 0)
    pairs = [
        ((100, 150), (150, 100)),
        ((97, 99), (50, 50)),
        ((64, 96), (66, 96)),
    ]
    emitted = []
    for i, ((h1, w1), (h2, w2)) in enumerate(pairs):
        emitted += list(
            b.add(
                rng.randint(0, 256, (h1, w1, 3), np.uint8),
                rng.randint(0, 256, (h2, w2, 3), np.uint8),
                key=i,
            )
        )
    emitted += list(b.flush())

    assert len(emitted) == 2
    bk0, c1, c2, ts1, ts2, meta = emitted[0]
    assert bk0 == (32, 48) and c1.shape == c2.shape == (2, 32, 48, 3)
    assert meta == {"keys": [0, 2], "n_valid": 2}
    np.testing.assert_array_equal(ts1, [[32, 48], [32, 48]])
    # second view of pair 0 is portrait: transposed true_shape, same canvas
    np.testing.assert_array_equal(ts2, [[48, 32], [32, 48]])

    bk1, c1, c2, ts1, ts2, meta = emitted[1]  # flushed square pair, padded
    assert bk1 == (32, 32) and meta == {"keys": [1, None], "n_valid": 1}
    np.testing.assert_array_equal(c1[0], c1[1])
    np.testing.assert_array_equal(c2[0], c2[1])


def test_square_bucket_keeps_portrait_orientation():
    """A portrait image assigned to a SQUARE bucket must NOT be transposed
    into the canvas: true_shape would be (s, s), the model would treat the
    row as landscape, and extract_view could never undo the transpose —
    predictions would come back silently mirrored. The fix treats square
    canvases as orientation-free and fills them in native orientation."""
    from uniception_tpu.data.bucketing import PairBucketedBatcher

    # a vertical gradient must stay vertical through a square canvas
    img = np.zeros((64, 40, 3), np.uint8)  # portrait
    img[:, :, 0] = np.linspace(0, 255, 64, dtype=np.uint8)[:, None]
    canvas, ts = resize_to_bucket(img, (32, 32), portrait=True)
    assert tuple(ts) == (32, 32)
    # rows increase top->bottom (native orientation), columns are constant
    red = canvas[:, :, 0].astype(np.int32)
    assert (np.diff(red.mean(axis=1)) >= 0).all() and red.mean(axis=1)[-1] > red.mean(axis=1)[0]
    assert np.ptp(red.mean(axis=0)) < np.ptp(red.mean(axis=1)) / 4

    # and the batchers route portrait images through the same rule
    b = BucketedBatcher(1, buckets=((32, 32),))
    (bk, cv, ts_b, meta), = list(b.add(img, key=0))
    np.testing.assert_array_equal(cv[0], canvas)
    np.testing.assert_array_equal(ts_b[0], [32, 32])

    pb = PairBucketedBatcher(1, buckets=((32, 32),))
    (bk, c1, c2, t1, t2, meta), = list(pb.add(img, img, key=0))
    np.testing.assert_array_equal(c1[0], canvas)
    np.testing.assert_array_equal(c2[0], canvas)


def test_pair_bucketed_serving_matches_per_pair_runs():
    """Mixed-size pair stream -> per-bucket DUSt3R forward; every valid row
    equals the same pair served alone (incl. a portrait second view)."""
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.data.bucketing import PairBucketedBatcher
    from uniception_tpu.models.factory.dust3r import DUSt3R

    buckets = ((32, 48), (32, 32))
    models = {
        hw: DUSt3R(
            name="pair_bucket_test", img_size=hw, patch_embed_cls="ManyAR_PatchEmbed",
            landscape_only=True, enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
            info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
            rngs=nnx.Rngs(0),
        )
        for hw in buckets
    }

    rng = np.random.RandomState(3)
    pairs = [((100, 150), (150, 100)), ((97, 99), (50, 50)), ((64, 96), (66, 96))]
    b = PairBucketedBatcher(2, buckets=buckets)
    emitted = []
    for i, ((h1, w1), (h2, w2)) in enumerate(pairs):
        emitted += list(
            b.add(
                rng.randint(0, 256, (h1, w1, 3), np.uint8),
                rng.randint(0, 256, (h2, w2, 3), np.uint8),
                key=i,
            )
        )
    emitted += list(b.flush())
    assert len(emitted) == 2

    for bucket_hw, c1, c2, ts1, ts2, meta in emitted:
        m = models[bucket_hw]
        x1 = jnp.asarray(np.transpose(c1, (0, 3, 1, 2)).astype(np.float32) / 255.0)
        x2 = jnp.asarray(np.transpose(c2, (0, 3, 1, 2)).astype(np.float32) / 255.0)
        t1, t2 = jnp.asarray(ts1), jnp.asarray(ts2)
        res1, res2 = m.forward_pair(x1, x2, true_shape1=t1, true_shape2=t2)
        for row in range(meta["n_valid"]):
            r1, r2 = m.forward_pair(
                x1[row : row + 1], x2[row : row + 1],
                true_shape1=t1[row : row + 1], true_shape2=t2[row : row + 1],
            )
            np.testing.assert_allclose(
                np.asarray(res1["pts3d"][row]), np.asarray(r1["pts3d"][0]), rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(res2["pts3d_in_other_view"][row]),
                np.asarray(r2["pts3d_in_other_view"][0]), rtol=1e-5, atol=1e-5,
            )
            # portrait rows come back native via the ManyAR unpack helper
            native = extract_view(np.asarray(res2["pts3d_in_other_view"][row]), ts2[row])
            assert native.shape[:2] == (int(ts2[row][0]), int(ts2[row][1]))
