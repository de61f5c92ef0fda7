"""
Cosmos tokenizer utilities (reference
uniception/models/libs/cosmos_tokenizer/modules/utils.py and utils.py:34-126).

The reference's torch.jit load/save becomes native checkpoint load into the
registered tokenizer networks; tensor<->numpy helpers keep the same [-1, 1]
image convention.
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import nnx

from uniception_tpu.models.libs.cosmos_tokenizer.networks import TokenizerConfigs, TokenizerModels
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["load_model", "numpy2tensor", "tensor2numpy", "pad_video_batch", "unpad_video_batch"]


def load_model(tokenizer_type: str, checkpoint_path: Optional[str] = None, rngs=None, **overrides):
    "Build a CI/DI/CV/DV tokenizer and load weights from a converted checkpoint."
    cfg = dict(TokenizerConfigs[tokenizer_type].value)
    cfg.update(overrides)
    cfg.pop("name", None)
    model = TokenizerModels[tokenizer_type].value(rngs=rngs or nnx.Rngs(0), **cfg)
    if checkpoint_path:
        ckpt = load_checkpoint(checkpoint_path)
        load_torch_state_dict(model, ckpt.get("model", ckpt), strict=False)
    return model


def numpy2tensor(arr: np.ndarray, range_min: float = -1.0, range_max: float = 1.0):
    "uint8 HWC / THWC image(s) -> float array in [range_min, range_max], channel-first."
    arr = np.asarray(arr)
    x = arr.astype(np.float32) / 255.0 * (range_max - range_min) + range_min
    if x.ndim == 3:  # HWC -> 1CHW
        return jnp.asarray(x.transpose(2, 0, 1)[None])
    if x.ndim == 4:  # THWC -> 1C THW
        return jnp.asarray(x.transpose(3, 0, 1, 2)[None])
    raise ValueError(f"Unsupported input shape {arr.shape}")


def tensor2numpy(x, range_min: float = -1.0, range_max: float = 1.0) -> np.ndarray:
    "Channel-first float array in [range_min, range_max] -> uint8 channel-last."
    x = np.asarray(x)
    x = (x - range_min) / (range_max - range_min)
    x = (x.clip(0, 1) * 255).astype(np.uint8)
    if x.ndim == 4:  # BCHW -> BHWC
        return x.transpose(0, 2, 3, 1)
    if x.ndim == 5:  # BCTHW -> BTHWC
        return x.transpose(0, 2, 3, 4, 1)
    return x


def pad_video_batch(video, temporal_multiple: int = 8, spatial_multiple: int = 16):
    "Pad (B, C, T, H, W) to 1+k*temporal frames and spatial multiples; returns (video, crop_region)."
    B, C, T, H, W = video.shape
    t_pad = (-(T - 1)) % temporal_multiple
    h_pad = (-H) % spatial_multiple
    w_pad = (-W) % spatial_multiple
    video = jnp.pad(video, ((0, 0), (0, 0), (0, t_pad), (0, h_pad), (0, w_pad)), mode="edge")
    return video, (T, H, W)


def unpad_video_batch(video, crop_region):
    T, H, W = crop_region
    return video[:, :, :T, :H, :W]
