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

from typing import List, Sequence, Tuple

import numpy as np

__all__ = ["pack_views", "extract_view", "extract_views"]


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
