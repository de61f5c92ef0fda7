"""
Ring attention: sequence-parallel exact attention over a mesh axis.

The reference has no context parallelism (SURVEY.md §2.8); its
length-generalization tools are math-level (SSMax, entropy scaling,
frame/global alternation). This module adds real sequence parallelism for
many-view global attention: tokens are sharded over a mesh axis, KV chunks
rotate around the ring via `jax.lax.ppermute` (XLA lowers to ICI
point-to-point), and partial attention is combined with the FlashAttention
online-softmax recurrence — the full (V*T)^2 score matrix never exists on
any single chip.

Use under `shard_map` with q/k/v sharded along the token axis:

    out = shard_map(
        partial(ring_attention, axis_name="context"),
        mesh=mesh, in_specs=P(None, "context"), out_specs=P(None, "context"),
    )(q, k, v)
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["ring_attention", "ring_attention_sharded"]

NEG_INF = -1e30


def _partial_attention(q, k, v, scale):
    """One KV chunk: returns (acc, m, l) — unnormalized output and softmax stats.

    q: (B, Nq, H, D); k/v: (B, Nk, H, D). Stats per (B, Nq, H).
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    m = jnp.max(s, axis=-1)  # (B, H, Nq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)  # (B, H, Nq)
    acc = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v).astype(jnp.float32)
    return acc, m, l


def ring_attention(q, k, v, axis_name: str, scale: Optional[float] = None):
    """Exact attention with the KV sequence sharded over `axis_name`.

    Called inside shard_map; q/k/v are the *local* (B, N_local, H, D) shards.
    Returns the local (B, N_local, H, D) output shard.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_dev = jax.lax.psum(1, axis_name)

    def step(carry, _):
        acc, m, l, kc, vc = carry
        acc_i, m_i, l_i = _partial_attention(q, kc, vc, scale)
        # online-softmax combine (FlashAttention recurrence)
        m_new = jnp.maximum(m, m_i)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(m_i - m_new)
        acc = acc * jnp.transpose(c_old, (0, 2, 1))[..., None] + acc_i * jnp.transpose(c_new, (0, 2, 1))[..., None]
        l = l * c_old + l_i * c_new
        # rotate kv around the ring
        kc = jax.lax.ppermute(kc, axis_name, [(i, (i + 1) % n_dev) for i in range(n_dev)])
        vc = jax.lax.ppermute(vc, axis_name, [(i, (i + 1) % n_dev) for i in range(n_dev)])
        return (acc, m_new, l, kc, vc), None

    B, Nq, H, D = q.shape

    # mark the accumulators as device-varying over the ring axis so the scan
    # carry types match after the ppermute (shard_map vma tracking);
    # jax.lax.pvary was deprecated in favor of pcast(..., to="varying")
    if hasattr(jax.lax, "pcast"):
        _vary = lambda x: jax.lax.pcast(x, axis_name, to="varying")
    else:  # pragma: no cover - older jax
        _vary = lambda x: jax.lax.pvary(x, axis_name)
    init = (
        _vary(jnp.zeros((B, Nq, H, D), jnp.float32)),
        _vary(jnp.full((B, H, Nq), NEG_INF, jnp.float32)),
        _vary(jnp.zeros((B, H, Nq), jnp.float32)),
        k,
        v,
    )
    (acc, m, l, _, _), _ = jax.lax.scan(step, init, None, length=n_dev)
    out = acc / jnp.transpose(l, (0, 2, 1))[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh, axis_name: str = "data", scale: Optional[float] = None):
    "Convenience wrapper: shard q/k/v over the token axis and run the ring."
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, axis_name)
    fn = shard_map(
        partial(ring_attention, axis_name=axis_name, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
