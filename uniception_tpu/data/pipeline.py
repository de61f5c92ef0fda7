"""
Host -> device input pipeline.

The reference has no data loader (single-GPU, examples feed tensors
directly); production TPU training needs host-side prefetch so the chips
never wait on input. This module provides:

    * prefetch_to_device — double-buffered async transfer of an iterator's
      batches onto the mesh (sharded along "data"), overlapping host work
      and transfers with device compute.
    * normalize_batch — image normalization by encoder type, applied
      host-side in numpy (keeps the jit trace clean of constants).

No native extension is needed here: image decode already happens in C
(PIL/libjpeg), and `jax.device_put` with a NamedSharding issues the DMA
asynchronously — the double buffer keeps it off the critical path.
"""

import collections
import itertools
from typing import Any, Iterable, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uniception_tpu.models.encoders.image_normalizations import normalize_image

__all__ = ["prefetch_to_device", "normalize_batch", "epoch_batches", "DeterministicSampler"]


def prefetch_to_device(
    iterator: Iterable[Any],
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    buffer_size: int = 2,
) -> Iterator[Any]:
    """Asynchronously stage batches on device, `buffer_size` ahead.

    Each batch (a pytree of numpy/jax arrays) is device_put with its leading
    axis sharded over `axis` when a mesh is given, else onto the default
    device. Transfers overlap with the consumer's compute because
    device_put is async and we stay `buffer_size` batches ahead.
    """
    sharding = NamedSharding(mesh, P(axis)) if mesh is not None else None

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    queue = collections.deque()
    it = iter(iterator)
    for batch in itertools.islice(it, buffer_size):
        queue.append(put(batch))
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass


def normalize_batch(images_uint8: np.ndarray, data_norm_type: str) -> np.ndarray:
    """uint8 (B, H, W, 3) -> normalized float32 (B, 3, H, W) for the encoder type.

    Uses the native single-pass C++ kernel when available (one fused
    convert+normalize+transpose write instead of numpy's four passes /
    three temporaries); falls back to numpy otherwise.
    """
    from uniception_tpu.models.encoders.image_normalizations import IMAGE_NORMALIZATION_DICT
    from uniception_tpu.native import load_preprocess

    lib = load_preprocess()
    if lib is not None and images_uint8.dtype == np.uint8 and images_uint8.ndim == 4 and images_uint8.shape[-1] == 3:
        import ctypes

        norm = IMAGE_NORMALIZATION_DICT[data_norm_type]
        # y = byte * scale + bias  ==  ((byte / 255) - mean) / std
        scale = (1.0 / (255.0 * norm.std)).astype(np.float32)
        bias = (-norm.mean / norm.std).astype(np.float32)
        src = np.ascontiguousarray(images_uint8)
        B, H, W, _ = src.shape
        dst = np.empty((B, 3, H, W), np.float32)
        lib.normalize_u8_hwc_to_f32_chw(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            B, H, W,
            scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            bias.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return dst
    x = images_uint8.astype(np.float32).transpose(0, 3, 1, 2) / 255.0
    return normalize_image(x, data_norm_type).astype(np.float32)


def epoch_batches(arrays, batch_size: int, *, rng: Optional[np.random.RandomState] = None, drop_last: bool = True):
    "Yield shuffled batch pytrees from a pytree of equal-length arrays."
    n = len(jax.tree.leaves(arrays)[0])
    order = np.arange(n)
    if rng is not None:
        rng.shuffle(order)
    end = n - (n % batch_size) if drop_last else n
    for i in range(0, end, batch_size):
        idx = order[i : i + batch_size]
        yield jax.tree.map(lambda a: a[idx], arrays)


class DeterministicSampler:
    """Step-indexed resumable batch sampler: the k-th batch of a run is a
    pure function of (seed, epoch-shuffle, k), so a run resumed at step k
    sees exactly the batches the uninterrupted run would have seen — the
    missing half of bit-exact resume (params/optimizer state round-trip via
    ``save_train_state``; THIS makes the data stream round-trip too, by
    persisting only an integer). Per-epoch shuffles derive from
    ``SeedSequence([seed, epoch])`` — stable across processes/platforms.

    Usage::

        sampler = DeterministicSampler(data, batch, seed=0, start_step=resumed_step)
        for batch in prefetch_to_device(sampler, mesh):  # infinite
            ...
            # checkpoint: save_train_state(..., step=<train step counter>)
            # — on resume, pass it back as start_step. Persist the number
            # of CONSUMED batches (the train-step counter), NOT
            # sampler.step: under prefetch_to_device the sampler runs
            # buffer_size batches ahead of consumption.
    """

    def __init__(self, arrays, batch_size: int, *, seed: int = 0, start_step: int = 0):
        self.arrays = arrays
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.step = int(start_step)
        self._n = len(jax.tree.leaves(arrays)[0])
        self.batches_per_epoch = self._n // self.batch_size
        if self.batches_per_epoch == 0:
            raise ValueError(f"dataset ({self._n}) smaller than batch_size ({batch_size})")
        self._epoch = None
        self._order = None

    def batch_at(self, step: int):
        "The batch the sampler yields at a given global step (pure function)."
        epoch, pos = divmod(step, self.batches_per_epoch)
        if self._epoch != epoch:
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch]))
            self._order = rng.permutation(self._n)
            self._epoch = epoch
        idx = self._order[pos * self.batch_size : (pos + 1) * self.batch_size]
        return jax.tree.map(lambda a: a[idx], self.arrays)

    def __iter__(self):
        while True:
            b = self.batch_at(self.step)
            self.step += 1
            yield b
