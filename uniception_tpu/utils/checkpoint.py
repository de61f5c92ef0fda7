"""
Checkpoint I/O.

Keeps the reference's checkpoint contract: a mapping with a ``"model"``
state dict plus metadata keys like ``data_norm_type`` / ``patch_embed_cls``
(reference: encoders/croco.py:99-111). The *canonical on-disk format* here is
a ``.npz`` holding torch-layout arrays under dotted keys plus a JSON
metadata entry — loadable with numpy alone. Torch ``.pth`` checkpoints are
read directly when torch is importable (CPU is sufficient), so reference
checkpoints work unconverted.
"""

import json
import os
from typing import Any, Dict

import numpy as np

__all__ = ["load_checkpoint", "save_checkpoint"]

_META_KEY = "__uniception_tpu_meta__"


def _torch_to_numpy_tree(obj):
    import torch

    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().float().numpy() if obj.dtype.is_floating_point else obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: _torch_to_numpy_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_torch_to_numpy_tree(v) for v in obj)
    return obj


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint from .npz (native) or .pth/.pt (torch) format.

    Returns a dict with at least a "model" key mapping dotted names to
    numpy arrays, plus any metadata keys stored alongside.
    """
    if path.endswith(".npz"):
        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data[_META_KEY])) if _META_KEY in data else {}
        model = {k[len("model."):]: data[k] for k in data.files if k.startswith("model.")}
        return {"model": model, **meta}
    if path.endswith((".pth", ".pt", ".bin")):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if "model" not in ckpt and all(hasattr(v, "shape") for v in ckpt.values()):
            ckpt = {"model": ckpt}
        return _torch_to_numpy_tree(ckpt)
    raise ValueError(f"Unknown checkpoint format: {path}")


def save_checkpoint(path: str, model_state: Dict[str, np.ndarray], **metadata):
    "Save a torch-layout state dict + metadata to the native .npz format."
    assert path.endswith(".npz"), "native checkpoints use .npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {f"model.{k}": np.asarray(v) for k, v in model_state.items()}
    payload[_META_KEY] = np.array(json.dumps(metadata))
    np.savez(path, **payload)
