"""ManyAR canvas packing/unpacking for mixed-orientation batches.

The ManyAR convention (reference: uniception/models/libs/croco/
patch_embed.py ManyAR_PatchEmbed; repo: encoders/patch_embed.py): every
image in a batch is stored in a fixed landscape canvas (H <= W). Portrait
images are SPATIALLY TRANSPOSED into that canvas, and ``true_shape``
(B, 2) = (true_h, true_w) records each sample's native orientation. With
``DUSt3R(landscape_only=True)`` the model's outputs come back in the same
canvas layout — portrait rows hold the transposed native prediction —
so hosts need exactly two helpers:

  pack_views(images)  -> (canvas, true_shape)   numpy, host-side
  extract_view(x, ts) -> native-orientation array for one sample

Static shapes only: one canvas size per batch (bucket mixed sizes into
separate batches before calling pack_views).
"""

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "pack_views",
    "extract_view",
    "extract_views",
    "DUST3R_512_BUCKETS",
    "DUST3R_224_BUCKETS",
    "assign_bucket",
    "resize_to_bucket",
    "with_portrait_buckets",
    "BucketedBatcher",
    "PairBucketedBatcher",
]


def pack_views(images: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Stack mixed landscape/portrait images into one ManyAR canvas batch.

    images: list of (C, H, W) arrays where each is either (C, h, w) or
        (C, w, h) for the batch's common (h <= w) canvas. Portrait samples
        (H > W) are transposed into the landscape canvas.

    Returns (canvas (B, C, h, w), true_shape (B, 2) int32).
    """
    if not images:
        raise ValueError("pack_views needs at least one image")
    rows, shapes = [], []
    for im in images:
        if im.ndim != 3:
            raise ValueError(f"expected (C, H, W), got shape {im.shape}")
        _, H, W = im.shape
        shapes.append((H, W))
        rows.append(np.swapaxes(im, -1, -2) if H > W else im)
    hw = {r.shape[-2:] for r in rows}
    if len(hw) != 1:
        raise ValueError(
            f"mixed canvas sizes {sorted(hw)}: bucket images so every batch "
            "shares one (h, w) canvas (transposes of each other are fine)"
        )
    return np.stack(rows), np.asarray(shapes, np.int32)


def extract_view(x: np.ndarray, true_shape: np.ndarray) -> np.ndarray:
    """Recover one sample's native-orientation array from a canvas-layout
    output (e.g. a ``pts3d`` row (h, w, C) or a ``conf`` row (h, w)).

    true_shape: (2,) = (true_h, true_w) for this sample. Portrait samples
    (true_h > true_w) are stored transposed in the canvas; this undoes it.
    The channel axis, if any, must be LAST (the factory's output layout).
    """
    x = np.asarray(x)
    th, tw = int(true_shape[0]), int(true_shape[1])
    if th > tw:  # portrait: canvas holds the spatial transpose
        x = np.swapaxes(x, 0, 1)
    if x.shape[:2] != (th, tw):
        raise ValueError(f"canvas {x.shape[:2]} does not match true_shape {(th, tw)}")
    return x


def extract_views(batch: np.ndarray, true_shapes: np.ndarray) -> List[np.ndarray]:
    """Vector form: one native-orientation array per batch row."""
    return [extract_view(batch[i], true_shapes[i]) for i in range(len(batch))]


# ---------------------------------------------------------------------------
# Size bucketing — arbitrary input resolutions on a static-shape compiler.
#
# The reference accepts any H, W divisible by the patch size (SURVEY.md
# "hard parts": torch re-specializes per shape; XLA would recompile). The
# TPU-native strategy: a small fixed set of landscape canvases ("buckets"),
# each compiled ONCE; every incoming image is aspect-matched to the nearest
# bucket, resized + center-cropped into it, and portrait images additionally
# ride the ManyAR transpose (landscape_only models recover native
# orientation via true_shape + extract_view). The 512 bucket set below is
# the published DUSt3R-512 training resolution family, so converted
# checkpoints see exactly the shapes they were trained on.
# ---------------------------------------------------------------------------

# (h, w) landscape canvases, all multiples of 16
DUST3R_512_BUCKETS: Tuple[Tuple[int, int], ...] = ((384, 512), (336, 512), (288, 512), (256, 512), (160, 512))
DUST3R_224_BUCKETS: Tuple[Tuple[int, int], ...] = ((224, 224),)


def assign_bucket(
    h: int,
    w: int,
    buckets: Sequence[Tuple[int, int]] = DUST3R_512_BUCKETS,
    manyar: bool = True,
) -> Tuple[int, bool]:
    """Pick the bucket whose aspect ratio best matches an (h, w) image.

    manyar=True (default): orientation-normalized — a portrait image
    (h > w) is matched against the landscape buckets transposed and flagged
    for the ManyAR canvas. The bucket family must be all-landscape.

    manyar=False: orientation is part of the canvas — the image's actual
    aspect is matched against each bucket's actual aspect and nothing is
    ever transposed (use :func:`with_portrait_buckets` to give portraits
    their own canvases). For models without the ManyAR convention
    (``UFMFlow``: the reference's named consumer UFM has no
    orientation-packing path either).

    Returns (bucket_index, is_portrait — always False when manyar=False).
    Matching minimizes |log(bucket_ar) - log(image_ar)| — symmetric in
    over/under-wide.
    """
    if h <= 0 or w <= 0:
        raise ValueError(f"bad image size ({h}, {w})")
    portrait = manyar and h > w
    ar = (h / w) if portrait else (w / h)
    best, best_err = 0, float("inf")
    for i, (bh, bw) in enumerate(buckets):
        if manyar and bh > bw:
            raise ValueError(f"bucket {i} {(bh, bw)} is not a landscape canvas (h <= w)")
        err = abs(np.log(bw / bh) - np.log(ar))
        if err < best_err:
            best, best_err = i, err
    return best, portrait


def with_portrait_buckets(buckets: Sequence[Tuple[int, int]]) -> Tuple[Tuple[int, int], ...]:
    "Extend a landscape bucket family with each canvas's transpose (manyar=False mode)."
    out = [tuple(b) for b in buckets]
    for bh, bw in list(out):
        if bh != bw and (bw, bh) not in out:
            out.append((bw, bh))
    return tuple(out)


def resize_to_bucket(
    image: np.ndarray, bucket_hw: Tuple[int, int], portrait: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Aspect-preserving resize + center-crop of one HWC uint8 image into a
    landscape canvas (the DUSt3R preprocessing recipe: scale so the canvas
    fits inside the scaled image, then crop the center).

    portrait images are resized in their native orientation and then
    TRANSPOSED into the canvas (ManyAR convention). A SQUARE canvas
    (bh == bw) carries no orientation information — true_shape would come
    back (s, s) and extract_view could never undo the transpose — so
    portrait is ignored there and the image fills the square directly in
    its native orientation.

    Returns (canvas (bh, bw, C) uint8, true_shape (2,) int32) where
    true_shape is (bh, bw) for landscape and (bw, bh) for portrait.
    """
    from PIL import Image

    if image.ndim != 3:
        raise ValueError(f"expected HWC image, got shape {image.shape}")
    bh, bw = bucket_hw
    if bh == bw:
        portrait = False
    th, tw = (bw, bh) if portrait else (bh, bw)  # target in native orientation
    H, W = image.shape[:2]
    scale = max(th / H, tw / W)
    rh, rw = max(th, int(round(H * scale))), max(tw, int(round(W * scale)))
    im = Image.fromarray(np.ascontiguousarray(image.astype(np.uint8)))
    im = im.resize((rw, rh), Image.BICUBIC)
    arr = np.asarray(im)
    y0, x0 = (rh - th) // 2, (rw - tw) // 2
    arr = arr[y0 : y0 + th, x0 : x0 + tw]
    if portrait:
        arr = np.swapaxes(arr, 0, 1)
    return arr, np.asarray((th, tw), np.int32)


class BucketedBatcher:
    """Streaming grouper: arbitrary-size images -> fixed-shape batches.

    add() assigns each image to its aspect bucket, resizes it into the
    bucket canvas, and buffers; a full batch is yielded as
    ``(bucket_hw, canvas (B, bh, bw, 3) uint8, true_shape (B, 2), keys)``.
    flush() drains the remainders, padded to the batch size by repeating the
    last sample (``n_valid`` in the key list tells the caller how many rows
    are real) — padding keeps every served shape static so each bucket
    compiles exactly once.
    """

    def __init__(self, batch_size: int, buckets: Sequence[Tuple[int, int]] = DUST3R_512_BUCKETS):
        if batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        self.batch_size = batch_size
        self.buckets = [tuple(b) for b in buckets]
        self._pending: Dict[int, List[Tuple[np.ndarray, np.ndarray, object]]] = {}

    def add(self, image: np.ndarray, key: object = None) -> Iterator[tuple]:
        "Buffer one HWC image; yields any batch this fill completes."
        idx, portrait = assign_bucket(image.shape[0], image.shape[1], self.buckets)
        canvas, ts = resize_to_bucket(image, self.buckets[idx], portrait)
        self._pending.setdefault(idx, []).append((canvas, ts, key))
        if len(self._pending[idx]) >= self.batch_size:
            yield self._emit(idx, self._pending.pop(idx), n_valid=self.batch_size)

    def flush(self) -> Iterator[tuple]:
        """Drain partial batches, padding each to batch_size (see n_valid).

        Padded rows repeat the last sample's pixels (static shapes) but carry
        key=None so a key->result mapping never double-delivers a request."""
        for idx in sorted(self._pending):
            rows = self._pending.pop(idx)
            n_valid = len(rows)
            pad = rows[-1][:-1] + (None,)
            rows = rows + [pad] * (self.batch_size - n_valid)
            yield self._emit(idx, rows, n_valid=n_valid)

    def _emit(self, idx, rows, n_valid):
        canvases, tss, keys = zip(*rows)
        return (
            self.buckets[idx],
            np.stack(canvases),
            np.stack(tss),
            {"keys": list(keys), "n_valid": n_valid},
        )


class PairBucketedBatcher:
    """Two-view variant of :class:`BucketedBatcher` for pair models (DUSt3R).

    Both views of a pair share one batch row and are resized into the SAME
    canvas — the bucket is chosen from the first view's aspect (the two
    views of a stereo/video pair are almost always the same camera), while
    each view keeps its own orientation flag, riding the ManyAR
    ``true_shape`` convention (``landscape_only=True`` models).

    ``add(img1, img2, key)`` buffers one pair and yields any batch it
    completes as ``(bucket_hw, canvas1 (B, bh, bw, 3) uint8, canvas2,
    true_shape1 (B, 2), true_shape2, meta)``; ``flush()`` drains remainders
    padded to the batch size (``meta["n_valid"]`` marks real rows) so every
    served shape stays static and each bucket compiles exactly once.

    ``manyar=False`` disables the orientation packing for models without
    the ManyAR convention (``UFMFlow``): buckets may then include portrait
    canvases (:func:`with_portrait_buckets`), nothing is transposed, and
    ``true_shape`` always equals the canvas shape.
    """

    def __init__(
        self,
        batch_size: int,
        buckets: Sequence[Tuple[int, int]] = DUST3R_512_BUCKETS,
        manyar: bool = True,
    ):
        if batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        self.batch_size = batch_size
        self.buckets = [tuple(b) for b in buckets]
        self.manyar = manyar
        self._pending: Dict[int, List[tuple]] = {}

    def add(self, img1: np.ndarray, img2: np.ndarray, key: object = None) -> Iterator[tuple]:
        "Buffer one HWC-image pair; yields any batch this fill completes."
        idx, portrait1 = assign_bucket(img1.shape[0], img1.shape[1], self.buckets, manyar=self.manyar)
        portrait2 = self.manyar and img2.shape[0] > img2.shape[1]
        c1, ts1 = resize_to_bucket(img1, self.buckets[idx], portrait1)
        c2, ts2 = resize_to_bucket(img2, self.buckets[idx], portrait2)
        self._pending.setdefault(idx, []).append((c1, c2, ts1, ts2, key))
        if len(self._pending[idx]) >= self.batch_size:
            yield self._emit(idx, self._pending.pop(idx), n_valid=self.batch_size)

    def flush(self) -> Iterator[tuple]:
        """Drain partial batches, padding each to batch_size (see n_valid).

        Padded rows repeat the last pair's pixels (static shapes) but carry
        key=None so a key->result mapping never double-delivers a request."""
        for idx in sorted(self._pending):
            rows = self._pending.pop(idx)
            n_valid = len(rows)
            pad = rows[-1][:-1] + (None,)
            rows = rows + [pad] * (self.batch_size - n_valid)
            yield self._emit(idx, rows, n_valid=n_valid)

    def _emit(self, idx, rows, n_valid):
        c1s, c2s, ts1s, ts2s, keys = zip(*rows)
        return (
            self.buckets[idx],
            np.stack(c1s),
            np.stack(c2s),
            np.stack(ts1s),
            np.stack(ts2s),
            {"keys": list(keys), "n_valid": n_valid},
        )
