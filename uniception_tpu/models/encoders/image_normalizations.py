"""
Canonical per-encoder image normalizations.

Parity with reference uniception/models/encoders/image_normalizations.py:11-40.
Every encoder's expected input normalization lives here; adaptors for
non-encoder consumers (sea_raft, unimatch, roma) are included for parity.
"""

from dataclasses import dataclass

import numpy as np

__all__ = ["ImageNormalization", "IMAGE_NORMALIZATION_DICT", "normalize_image"]


@dataclass
class ImageNormalization:
    mean: np.ndarray
    std: np.ndarray


def _norm(mean, std):
    return ImageNormalization(mean=np.asarray(mean, np.float32), std=np.asarray(std, np.float32))


IMAGE_NORMALIZATION_DICT = {
    "dummy": _norm([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
    "croco": _norm([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    "dust3r": _norm([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    "dune": _norm([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    "dinov2": _norm([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    "dinov3": _norm([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    "perception_encoder": _norm([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    "identity": _norm([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
    "patch_embedder": _norm([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    "radio": _norm([0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
    "sea_raft": _norm([0.0, 0.0, 0.0], np.ones(3, np.float32) / 255),  # 0-255 in FP32
    "unimatch": _norm([0.0, 0.0, 0.0], np.ones(3, np.float32) / 255),  # 0-255 in FP32
    "roma": _norm([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    "cosmos": _norm([0.0, 0.0, 0.0], [0.5, 0.5, 0.5]),
    "pixio": _norm([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
}


def normalize_image(image_01, data_norm_type: str):
    """Normalize a (..., 3, H, W) image in [0, 1] for the given encoder type."""
    norm = IMAGE_NORMALIZATION_DICT[data_norm_type]
    mean = norm.mean.reshape(3, 1, 1)
    std = norm.std.reshape(3, 1, 1)
    return (image_01 - mean) / std
