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

__all__ = [
    "scaled_dot_product_attention",
    "set_sequence_parallel",
    "get_sequence_parallel",
    "sequence_parallel",
    "set_activation_sharding",
    "activation_sharding",
]

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


# Activation-sharding constraints at the attention boundary. Under FSDP the
# parameters are sharded over the "data" axis; GSPMD propagates those weight
# shardings through the (B, N, C) -> (B, N, H, D) qkv reshapes into the
# attention activations, and when C's 8-way split has no clean image on the
# head dim (e.g. 12 heads) it picks a degenerate head-split + replicate
# sharding for the softmax intermediates, then pays an "[SPMD] Involuntary
# full rematerialization" reshard between forward-saved tensors and the
# backward's demands (observed in MULTICHIP_r04.json, VERDICT r4 weak #1).
# Constraining q/k/v and the output to batch-on-data (heads on the tp axis
# when one exists) pins BOTH the forward shardings and — through
# with_sharding_constraint's transpose — their cotangents, which stops the
# propagation at the boundary: this is the standard activation-partitioning
# recipe from the JAX scaling playbook.
_ACT_SHARD = None  # (mesh, batch_axis, model_axis | None)


def set_activation_sharding(mesh=None, batch_axis: str = "data", model_axis: Optional[str] = None):
    "Enable (mesh, axes) or disable (mesh=None) attention activation-sharding constraints."
    global _ACT_SHARD
    _ACT_SHARD = None if mesh is None else (mesh, batch_axis, model_axis)


@contextlib.contextmanager
def activation_sharding(mesh, batch_axis: str = "data", model_axis: Optional[str] = None):
    "Context manager form of :func:`set_activation_sharding`."
    global _ACT_SHARD
    prev = _ACT_SHARD
    _ACT_SHARD = (mesh, batch_axis, model_axis)
    try:
        yield
    finally:
        _ACT_SHARD = prev


def _constrain_activation(t):
    "Pin a (B, N, H, D) attention tensor to batch-on-data (+ heads-on-model)."
    if _ACT_SHARD is None:
        return t
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh, batch_axis, model_axis = _ACT_SHARD
    if t.ndim != 4 or t.shape[0] % mesh.shape[batch_axis] != 0:
        return t
    ma = model_axis if (model_axis is not None and t.shape[2] % mesh.shape[model_axis] == 0) else None
    spec = P(batch_axis, None, ma, None)
    return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))


def _xla_attention(q, k, v, scale):
    """SPMD-clean einsum attention — the same math as
    ``jax.nn.dot_product_attention(implementation="xla")`` (f32 logits via
    dot-algorithm precision, f32 softmax, probs cast to the key dtype) but
    WITHOUT its internal ``vmap`` over a size-1 GQA group dim: GSPMD
    propagation through those degenerate dims triggers "[SPMD] Involuntary
    full rematerialization" fallbacks on softmax intermediates under
    dp/fsdp meshes (observed in the fsdp dryrun, MULTICHIP_r04.json).
    Plain einsums keep the batch dim first-class so the data-axis sharding
    flows straight through."""
    logits_dtype = jnp.promote_types(q.dtype, jnp.float32)
    precision = jax.lax.DotAlgorithmPreset.BF16_BF16_F32 if q.dtype == jnp.bfloat16 else None
    try:
        logits = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, precision=precision, preferred_element_type=logits_dtype
        )
    except Exception:  # backends without explicit dot-algorithm support
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=logits_dtype)
    logits = logits * jnp.asarray(scale, logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(k.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


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

    if _ACT_SHARD is not None:
        q, k, v = _constrain_activation(q), _constrain_activation(k), _constrain_activation(v)

    # jax.nn.dot_product_attention and the flash kernel require matching
    # q/k/v head dims; differential attention uses Dv = 2*Dq (torch SDPA
    # permits this), so route it through the explicit einsum path.
    if impl == "naive" or v.shape[-1] != q.shape[-1]:
        return _constrain_activation(_naive_attention(q, k, v, scale))

    if impl == "pallas" and _on_tpu():
        from uniception_tpu.ops.flash_attention import flash_attention

        return _constrain_activation(flash_attention(q, k, v, scale=scale))

    if k.shape[2] != q.shape[2]:  # grouped-query shapes: jax's GQA handling
        return _constrain_activation(jax.nn.dot_product_attention(q, k, v, scale=scale))
    return _constrain_activation(_xla_attention(q, k, v, scale))
