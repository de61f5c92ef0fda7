"""
Llama-style transformer utilities (Perception Encoder vendored lib).

Behavioral parity with reference
uniception/models/libs/perception_encoder/transformer.py:16-649: rotary
embedding with Llama-3 long-context frequency scaling, grouped-query
attention (GQA), SwiGLU feed-forward with the 2/3 + multiple_of hidden
sizing, RMSNorm blocks, and the BaseTransformer stack. (The reference
vendors this for PE's language side; nothing in the reference imports it
at runtime, but it is part of the shipped library surface.)

TPU notes: rotary rotation is expressed as cos/sin elementwise math (VPU)
instead of materialized 2x2 matrices; attention goes through the shared
dispatch (Pallas flash kernel on TPU for the unmasked path, fp32-softmax
einsum for masked); all shapes are static for XLA.
"""

from dataclasses import dataclass
from enum import Enum
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.ops.attention import scaled_dot_product_attention

__all__ = [
    "InitStdFactor",
    "BaseTransformerArgs",
    "RotaryEmbedding",
    "LlamaRMSNorm",
    "Attention",
    "FeedForward",
    "TransformerBlock",
    "BaseTransformer",
    "repeat_kv",
    "apply_rotary_emb",
    "cross_entropy",
]


class InitStdFactor(Enum):
    DISABLED = "disabled"
    GLOBAL_DEPTH = "global_depth"
    CURRENT_DEPTH = "current_depth"
    DIM_RATIO = "dim_ratio"


@dataclass
class BaseTransformerArgs:
    "Mirror of transformer.py:24-47."

    dim: int = 512
    n_layers: int = 8
    head_dim: Optional[int] = None
    n_heads: Optional[int] = None
    n_kv_heads: Optional[int] = None
    ffn_dim_multiplier: Optional[float] = None
    multiple_of: int = 256
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    old_context_len: int = 8192
    rope_scale_factor: int = 1
    low_freq_factor: int = 1
    high_freq_factor: int = 32
    init_base_std: Optional[float] = None
    init_std_factor: str = "disabled"
    max_seqlen: int = 1024


def cross_entropy(pred, target):
    "Token-level NLL over flattened logits (transformer.py:50-55)."
    logp = jax.nn.log_softmax(pred.reshape(-1, pred.shape[-1]).astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, target.reshape(-1, 1), axis=-1).mean()


def repeat_kv(x, n_rep: int):
    "(B, S, Hkv, D) -> (B, S, Hkv * n_rep, D), grouped-query expansion (transformer.py:58-69)."
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(b, s, h * n_rep, d)


def apply_rotary_emb(xq, xk, cos, sin):
    """Rotate adjacent channel pairs by position-dependent angles.

    cos/sin: (S, D/2); xq/xk: (B, S, H, D) with D/2 interleaved pairs —
    the same math as the reference's (S, D/2, 2, 2) rotation-matrix
    contraction (transformer.py:98-109), expressed as elementwise VPU ops.
    """

    def rot(x):
        x2 = x.reshape(*x.shape[:-1], -1, 2)
        c = cos[None, :, None, :, None]
        s = sin[None, :, None, :, None]
        x0, x1 = x2[..., :1], x2[..., 1:]
        out = jnp.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
        return out.reshape(x.shape).astype(x.dtype)

    return rot(xq), rot(xk)


class RotaryEmbedding(nnx.Module):
    "Rotary table with Llama-3 long-context scaling (transformer.py:191-291)."

    def __init__(
        self,
        theta: float,
        head_dim: int,
        max_seqlen: int = 1024,
        scale_factor: int = 1,
        low_freq_factor: int = 1,
        high_freq_factor: int = 32,
        old_context_len: int = 8192,
    ):
        import math

        freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2)[: head_dim // 2].astype(jnp.float32) / head_dim))
        if scale_factor != 1:
            low_wavelen = old_context_len / low_freq_factor
            high_wavelen = old_context_len / high_freq_factor
            wavelen = 2 * math.pi / freqs
            smooth = (old_context_len / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
            smoothed = (1 - smooth) * freqs / scale_factor + smooth * freqs
            freqs = jnp.where(wavelen < high_wavelen, freqs, jnp.where(wavelen > low_wavelen, freqs / scale_factor, smoothed))
        t = jnp.arange(max_seqlen, dtype=jnp.float32)
        angles = jnp.outer(t, freqs)  # (S, D/2)
        self.cos = nnx.Variable(jnp.cos(angles))
        self.sin = nnx.Variable(jnp.sin(angles))

    def __call__(self, seqlen: Optional[int] = None, tok_idx=None):
        if tok_idx is not None:
            return self.cos[...][tok_idx], self.sin[...][tok_idx]
        return self.cos[...][:seqlen], self.sin[...][:seqlen]


class LlamaRMSNorm(nnx.Module):
    "RMSNorm with fp32 internal math (transformer.py:294-322). torch key: weight."

    def __init__(self, dim: int, eps: float = 1e-6, *, param_dtype=jnp.float32, rngs=None):
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((dim,), param_dtype))

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + self.eps)
        return (normed * self.weight[...].astype(jnp.float32)).astype(x.dtype)


class Attention(nnx.Module):
    "GQA attention with rotary embedding (transformer.py:336-456)."

    def __init__(self, dim: int, head_dim: int, n_heads: int, n_kv_heads: int, rope_theta: float, *, dtype=None, param_dtype=jnp.float32, rngs):
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.dim = dim
        self.head_dim = head_dim
        self.n_heads = n_heads
        self.n_kv_heads = n_kv_heads
        self.heads_per_group = n_heads // n_kv_heads
        self.wq = nnx.Linear(dim, n_heads * head_dim, **kw)
        self.wk = nnx.Linear(dim, n_kv_heads * head_dim, **kw)
        self.wv = nnx.Linear(dim, n_kv_heads * head_dim, **kw)
        self.wo = nnx.Linear(n_heads * head_dim, dim, **kw)

    def __call__(self, x, cos, sin, mask=None):
        "mask: None, 'causal', or an additive (S, S) array."
        B, S, _ = x.shape
        xq = self.wq(x).reshape(B, S, self.n_heads, self.head_dim)
        xk = self.wk(x).reshape(B, S, self.n_kv_heads, self.head_dim)
        xv = self.wv(x).reshape(B, S, self.n_kv_heads, self.head_dim)
        xq, xk = apply_rotary_emb(xq, xk, cos[:S], sin[:S])
        xk = repeat_kv(xk, self.heads_per_group)
        xv = repeat_kv(xv, self.heads_per_group)
        if mask is None:
            out = scaled_dot_product_attention(xq, xk, xv)
        else:
            if isinstance(mask, str):
                assert mask == "causal"
                row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
                mask = jnp.where(col > row, -jnp.inf, 0.0)
            logits = jnp.einsum("bnhd,bmhd->bhnm", xq * self.head_dim**-0.5, xk).astype(jnp.float32)
            logits = logits + mask.astype(jnp.float32)[None, None]
            out = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(logits, axis=-1).astype(xv.dtype), xv)
        return self.wo(out.reshape(B, S, self.n_heads * self.head_dim))


class FeedForward(nnx.Module):
    "SwiGLU MLP with Llama hidden sizing (transformer.py:459-500)."

    def __init__(self, dim: int, hidden_dim: int, multiple_of: int, ffn_dim_multiplier: Optional[float], *, dtype=None, param_dtype=jnp.float32, rngs):
        hidden_dim = int(2 * hidden_dim / 3)
        if ffn_dim_multiplier is not None:
            hidden_dim = int(ffn_dim_multiplier * hidden_dim)
        hidden_dim = multiple_of * ((hidden_dim + multiple_of - 1) // multiple_of)
        self.dim = dim
        self.hidden_dim = hidden_dim
        kw = dict(use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.w1 = nnx.Linear(dim, hidden_dim, **kw)
        self.w3 = nnx.Linear(dim, hidden_dim, **kw)
        self.w2 = nnx.Linear(hidden_dim, dim, **kw)

    def __call__(self, x):
        return self.w2(jax.nn.silu(self.w1(x)) * self.w3(x))


class TransformerBlock(nnx.Module):
    "Pre-RMSNorm attention + SwiGLU block (transformer.py:524-576)."

    def __init__(self, args: BaseTransformerArgs, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.head_dim = args.head_dim or args.dim // args.n_heads
        self.n_heads = args.n_heads or args.dim // args.head_dim
        self.n_kv_heads = args.n_kv_heads or self.n_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.attention = Attention(
            dim=args.dim, head_dim=self.head_dim, n_heads=self.n_heads,
            n_kv_heads=self.n_kv_heads, rope_theta=args.rope_theta, **kw,
        )
        self.feed_forward = FeedForward(
            dim=args.dim, hidden_dim=4 * args.dim, multiple_of=args.multiple_of,
            ffn_dim_multiplier=args.ffn_dim_multiplier, **kw,
        )
        self.attention_norm = LlamaRMSNorm(args.dim, eps=args.norm_eps, param_dtype=param_dtype)
        self.ffn_norm = LlamaRMSNorm(args.dim, eps=args.norm_eps, param_dtype=param_dtype)

    def __call__(self, x, cos, sin, mask=None):
        h = x + self.attention(self.attention_norm(x), cos, sin, mask=mask)
        return h + self.feed_forward(self.ffn_norm(h))


class BaseTransformer(nnx.Module):
    "Stack of Llama blocks with a shared rotary table (transformer.py:579-649)."

    def __init__(self, args: BaseTransformerArgs, *, dtype=None, param_dtype=jnp.float32, rngs=None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.dim = args.dim
        self.max_seqlen = args.max_seqlen
        self.rope_embeddings = RotaryEmbedding(
            theta=args.rope_theta,
            head_dim=args.head_dim or args.dim // args.n_heads,
            max_seqlen=args.max_seqlen,
            scale_factor=args.rope_scale_factor,
            low_freq_factor=args.low_freq_factor,
            high_freq_factor=args.high_freq_factor,
            old_context_len=args.old_context_len,
        )
        self.layers = nnx.List([TransformerBlock(args, dtype=dtype, param_dtype=param_dtype, rngs=rngs) for _ in range(args.n_layers)])

    def __call__(self, h, tok_idx=None, mask=None):
        cos, sin = self.rope_embeddings(seqlen=self.max_seqlen, tok_idx=tok_idx)
        for layer in self.layers:
            h = layer(h, cos, sin, mask=mask)
        return h
