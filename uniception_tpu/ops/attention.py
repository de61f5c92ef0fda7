"""
Attention dispatch for TPU.

TPU-native replacement for the reference's fused-vs-manual attention switch
(reference: uniception/models/utils/transformer_blocks.py:243-252 chooses
F.scaled_dot_product_attention vs explicit softmax via utils/config.py).

Token layout is (B, N, H, D) — batch, tokens, heads, head-dim — the layout
`jax.nn.dot_product_attention` expects and the one that avoids transposes
around the (B, N, C) <-> (B, N, H, D) reshapes.

Implementations:
    * "xla":    jax.nn.dot_product_attention — XLA emits MXU-tiled fused
                matmul/softmax chains; the default.
    * "pallas": Pallas TPU flash-attention kernel (ops/flash_attention.py);
                falls back to "xla" off-TPU.
    * "naive":  explicit softmax in fp32 — the parity oracle.
"""

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

from uniception_tpu.models.utils.config import get_attention_impl

__all__ = ["scaled_dot_product_attention", "set_sequence_parallel", "get_sequence_parallel", "sequence_parallel"]

# Sequence parallelism (SP / context parallelism): when set, self-attention
# calls with q/k token counts divisible by the mesh axis route through the
# ring-attention collective (parallel/ring_attention.py) — the V*T token axis
# is sharded over the mesh axis and KV chunks rotate over ICI. This is the
# TPU-native long-context answer the reference lacks (SURVEY.md §5).
_SEQ_PARALLEL = None  # (mesh, axis_name) or None


def set_sequence_parallel(mesh=None, axis_name: str = "data"):
    "Enable (mesh, axis) or disable (mesh=None) ring-attention sequence parallelism."
    global _SEQ_PARALLEL
    _SEQ_PARALLEL = None if mesh is None else (mesh, axis_name)


def get_sequence_parallel():
    return _SEQ_PARALLEL


@contextlib.contextmanager
def sequence_parallel(mesh, axis_name: str = "data"):
    "Context manager form of :func:`set_sequence_parallel`."
    global _SEQ_PARALLEL
    prev = _SEQ_PARALLEL
    _SEQ_PARALLEL = (mesh, axis_name)
    try:
        yield
    finally:
        _SEQ_PARALLEL = prev


def _naive_attention(q, k, v, scale):
    # explicit softmax reference path (transformer_blocks.py:247-252)
    q = q * scale
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", weights, v)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, N, H, D) tensors.

    Args:
        q: queries (B, Nq, H, D)
        k: keys (B, Nk, H, D)
        v: values (B, Nk, H, D)
        scale: softmax scale; defaults to D**-0.5.
        impl: override the globally configured implementation.

    Returns:
        (B, Nq, H, D) attention output.
    """
    impl = impl or get_attention_impl()
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if _SEQ_PARALLEL is not None and v.shape[-1] == q.shape[-1]:
        mesh, axis = _SEQ_PARALLEL
        n_dev = mesh.shape[axis]
        if q.shape[1] % n_dev == 0 and k.shape[1] % n_dev == 0:
            from uniception_tpu.parallel.ring_attention import ring_attention_sharded

            return ring_attention_sharded(q, k, v, mesh, axis, scale=scale)

    # jax.nn.dot_product_attention and the flash kernel require matching
    # q/k/v head dims; differential attention uses Dv = 2*Dq (torch SDPA
    # permits this), so route it through the explicit einsum path.
    if impl == "naive" or v.shape[-1] != q.shape[-1]:
        return _naive_attention(q, k, v, scale)

    if impl == "pallas" and _on_tpu():
        from uniception_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)

    return jax.nn.dot_product_attention(q, k, v, scale=scale)
