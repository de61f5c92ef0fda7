"""
Perception-Encoder preprocessing transforms (libs/perception_encoder/transforms.py).

The reference transform (vision_encoder/transforms.py:4-22) is torchvision
Compose; torchvision is absent in this environment, so these tests gate the
documented semantics directly: squash vs shorter-edge-resize + center-crop,
ToTensor scaling, and mean/std-0.5 normalization into [-1, 1].
"""

import numpy as np
import pytest

from uniception_tpu.models.libs.perception_encoder.transforms import get_image_transform

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _img(w, h, value=None):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8) if value is None else np.full((h, w, 3), value, np.uint8)
    return Image.fromarray(arr)


def test_squash_mode_shape_and_range():
    t = get_image_transform(image_size=64)
    out = t(_img(100, 40))
    assert out.shape == (3, 64, 64) and out.dtype == np.float32
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_normalization_maps_midgray_to_zero():
    # uint8 127/255 ~ 0.498 -> (x - .5)/.5 ~ -0.0039; 255 -> +1; 0 -> -1
    t = get_image_transform(image_size=8)
    np.testing.assert_allclose(t(_img(8, 8, value=255)), 1.0, atol=1e-6)
    np.testing.assert_allclose(t(_img(8, 8, value=0)), -1.0, atol=1e-6)
    assert abs(t(_img(8, 8, value=127)).mean()) < 5e-3


def test_center_crop_mode_resizes_shorter_edge():
    """center_crop=True: shorter edge -> image_size, then square center crop
    (torchvision T.Resize(int) + T.CenterCrop semantics). A wide gradient
    image keeps its central band, a squash would distort it."""
    w, h, size = 200, 100, 50
    grad = np.tile(np.linspace(0, 255, w, dtype=np.uint8)[None, :, None], (h, 1, 3))
    t = get_image_transform(image_size=size, center_crop=True)
    out = t(Image.fromarray(grad))
    assert out.shape == (3, size, size)
    # shorter edge (h=100) scaled to 50 => width becomes 100; crop keeps
    # columns [25, 75) of that, i.e. source pixels ~[50, 150) of 200:
    # the output's horizontal span should be the middle half of [-1, 1]
    col_means = out.mean(axis=(0, 1))
    assert col_means[0] > -0.6 and col_means[-1] < 0.6  # edges of source are cropped away
    assert col_means[-1] > col_means[0]  # gradient preserved left-to-right


def test_channels_last_and_ndarray_input():
    t = get_image_transform(image_size=16, channels_last=True)
    arr = np.random.RandomState(1).randint(0, 256, (24, 32, 3), dtype=np.uint8)
    out = t(arr)
    assert out.shape == (16, 16, 3)
    # grayscale input converts to RGB
    gray = np.random.RandomState(2).randint(0, 256, (24, 32), dtype=np.uint8)
    out2 = t(gray)
    assert out2.shape == (16, 16, 3)
    np.testing.assert_allclose(out2[..., 0], out2[..., 1])


def test_interpolation_validation():
    with pytest.raises(ValueError):
        get_image_transform(image_size=8, interpolation="area")
