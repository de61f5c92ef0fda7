"""
LoRA adapters: parameter-efficient finetuning for the frozen-encoder era.

The reference is an encoder-zoo library built around frozen pretrained
trunks (SURVEY.md §0) but ships no finetuning machinery at all; this is
the TPU-native extension that makes the standard recipe cheap. A
:class:`LoRALinear` wraps a loaded ``nnx.Linear`` with a rank-``r``
update ``y = base(x) + (x @ A) @ B * (alpha / r)`` (``B`` zero-init, so
wrapping is exact-identity until training). Combined with
``make_train_step(trainable=lora_trainable)`` only the adapters get
gradients, optimizer moments, and checkpoint deltas — the base weights'
wgrad matmuls are dead-code-eliminated from the backward by the same
``stop_gradient`` mechanism the freeze path uses (parallel/training.py).

For serving, :func:`merge_lora` folds every adapter back into its base
kernel in place (``W += A @ B * scale``), restoring plain ``nnx.Linear``
modules — zero runtime overhead and full compatibility with the int8 /
scan / AOT serving paths, which see an ordinary checkpoint.

Like ``nn/quant.py::quantize_linears``, :func:`apply_lora` is a
post-construction in-place transform, so the torch state-dict key
contract of the base modules is untouched: load the pretrained
checkpoint first, then wrap.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["LoRALinear", "apply_lora", "merge_lora", "lora_trainable"]


class LoRALinear(nnx.Module):
    """A frozen ``nnx.Linear`` plus a trainable low-rank update.

    ``y = base(x) + (x @ lora_a) @ lora_b * (alpha / rank)``

    ``lora_b`` is zero-initialized: wrapping a layer changes nothing until
    the adapters train. ``lora_a`` uses the LoRA-standard scaled normal
    init. Adapters are stored in the base kernel's dtype so the compute
    path (bf16 trunks) is unchanged.
    """

    def __init__(self, base: nnx.Linear, rank: int = 8, alpha: Optional[float] = None, *, rngs: nnx.Rngs):
        if rank < 1:
            raise ValueError(f"rank must be >= 1, got {rank}")
        in_f, out_f = base.kernel[...].shape
        dtype = base.kernel[...].dtype
        self.base = base
        self.rank = rank
        self.alpha = float(alpha if alpha is not None else rank)
        self.lora_a = nnx.Param(
            (jax.random.normal(rngs.params(), (in_f, rank)) * (1.0 / rank)).astype(dtype)
        )
        self.lora_b = nnx.Param(jnp.zeros((rank, out_f), dtype))

    def __call__(self, x):
        y = self.base(x)
        scale = jnp.asarray(self.alpha / self.rank, x.dtype)
        return y + ((x @ self.lora_a[...].astype(x.dtype)) @ self.lora_b[...].astype(x.dtype)) * scale

    def merged_kernel(self):
        "Base kernel with the adapter folded in (base dtype preserved)."
        k = self.base.kernel[...]
        delta = (self.lora_a[...].astype(jnp.float32) @ self.lora_b[...].astype(jnp.float32)) * (
            self.alpha / self.rank
        )
        return (k.astype(jnp.float32) + delta).astype(k.dtype)


def _maybe_children(node):
    "Yield (setter, name, child) triples for nnx.Module attributes and list items."
    if isinstance(node, nnx.Module):
        for name, value in list(vars(node).items()):
            yield (lambda v, n=node, a=name: setattr(n, a, v)), name, value
    elif isinstance(node, (list, nnx.List)):
        for i, value in enumerate(list(node)):
            yield (lambda v, n=node, j=i: n.__setitem__(j, v)), str(i), value


def apply_lora(
    module: nnx.Module,
    rank: int = 8,
    alpha: Optional[float] = None,
    *,
    rngs: nnx.Rngs,
    min_params: int = 1 << 16,
    predicate: Optional[Callable[[str, nnx.Linear], bool]] = None,
    _path: str = "",
) -> int:
    """Wrap every large ``nnx.Linear`` under ``module`` (in place) with a
    :class:`LoRALinear`. Returns the number of layers wrapped.

    min_params: skip layers with fewer kernel elements (biases, tiny heads).
    predicate: optional ``(dotted_path, linear) -> bool`` filter on top of
        the size threshold, e.g. ``lambda p, _: "qkv" in p``.
    """
    count = 0
    for setter, name, child in _maybe_children(module):
        child_path = f"{_path}.{name}".lstrip(".")
        if isinstance(child, nnx.Linear):
            if child.kernel[...].size >= min_params and (predicate is None or predicate(child_path, child)):
                setter(LoRALinear(child, rank=rank, alpha=alpha, rngs=rngs))
                count += 1
        elif isinstance(child, (nnx.Module, list, nnx.List)) and not isinstance(child, LoRALinear):
            count += apply_lora(
                child, rank=rank, alpha=alpha, rngs=rngs,
                min_params=min_params, predicate=predicate, _path=child_path,
            )
    return count


def merge_lora(module: nnx.Module) -> int:
    """Fold every :class:`LoRALinear` under ``module`` back into its base
    ``nnx.Linear`` in place (``W += A @ B * scale``). Returns the count.

    The result is an ordinary module tree — serve it through any path
    (int8 quantization, scan layout, native checkpoints, AOT artifacts).
    """
    count = 0
    for setter, name, child in _maybe_children(module):
        if isinstance(child, LoRALinear):
            base = child.base
            base.kernel[...] = child.merged_kernel()
            setter(base)
            count += 1
        elif isinstance(child, (nnx.Module, list, nnx.List)):
            count += merge_lora(child)
    return count


def lora_trainable(path: str) -> bool:
    "``make_train_step(trainable=lora_trainable)``: train only the adapters."
    return ".lora_a." in path or ".lora_b." in path or path.startswith(("lora_a.", "lora_b."))
