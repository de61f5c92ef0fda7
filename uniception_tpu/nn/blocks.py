"""
Shared transformer building blocks (TPU-native, flax.nnx).

Behavioral parity with the reference's block library
(reference: uniception/models/utils/transformer_blocks.py:38-1046):
Mlp, SwiGLUFFN(+Fused), LayerScale, DropPath, RMSNorm, Attention,
CrossAttention, Self/CrossAttentionBlock and the Differential-attention
variants, including:

    * scalable softmax (q * log N, arXiv:2501.19399;
      transformer_blocks.py:231-233)
    * entropy scaling (sqrt(gamma * log N / log N0), arXiv:2502.07785;
      transformer_blocks.py:235-241)
    * latent-attention option (transformer_blocks.py:178-187)
    * custom positional-encoding hook on q/k (transformer_blocks.py:224-229)

TPU-first design differences:
    * token layout inside attention is (B, N, H, D) — no (B, H, N, D)
      transposes; `custom_positional_encoding` callables therefore take
      (tokens (B, N, H, D), positions (B, N, 2)).
    * attention dispatches to a Pallas flash-attention kernel or XLA's fused
      SDPA via ops/attention.py.
    * every module takes an explicit compute `dtype` (bf16 trunks) with
      fp32 params.

Submodule attribute names intentionally mirror the reference's state-dict
keys (qkv, proj, fc1, fc2, norm1, ...) so the torch->jax checkpoint
converter is mechanical.
"""

import math
import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from flax import nnx

from uniception_tpu.nn.common import Identity, LinearX, gelu_exact
from uniception_tpu.ops.attention import scaled_dot_product_attention

__all__ = [
    "Mlp",
    "SwiGLUFFN",
    "SwiGLUFFNFused",
    "LayerScale",
    "DropPath",
    "RMSNorm",
    "Attention",
    "CrossAttention",
    "SelfAttentionBlock",
    "CrossAttentionBlock",
    "DiffAttention",
    "DiffCrossAttention",
    "DiffSelfAttentionBlock",
    "DiffCrossAttentionBlock",
    "lambda_init_fn",
    "make_norm_layer",
    "layer_norm_factory",
]


def make_norm_layer(dim: int, *, eps: float = 1e-5, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
    "Default norm factory: LayerNorm with torch-default eps=1e-5."
    return nnx.LayerNorm(dim, epsilon=eps, dtype=dtype, param_dtype=param_dtype, rngs=rngs)


def layer_norm_factory(eps: float = 1e-5) -> Callable:
    "Return a norm factory with a fixed eps (analogue of partial(nn.LayerNorm, eps=...))."
    return partial(make_norm_layer, eps=eps)


class Mlp(nnx.Module):
    "ViT MLP (transformer_blocks.py:66-89). fc1 -> act -> drop -> fc2 -> drop."

    def __init__(
        self,
        in_features: int,
        hidden_features: Optional[int] = None,
        out_features: Optional[int] = None,
        act_layer: Callable = gelu_exact,
        bias: bool = True,
        drop: float = 0.0,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = LinearX(in_features, hidden_features, use_bias=bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.act = act_layer
        self.drop1 = nnx.Dropout(drop, rngs=rngs)
        self.fc2 = LinearX(hidden_features, out_features, use_bias=bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.drop2 = nnx.Dropout(drop, rngs=rngs)

    def __call__(self, x):
        x = self.fc1(x)
        x = self.act(x)
        x = self.drop1(x)
        x = self.fc2(x)
        x = self.drop2(x)
        return x


class SwiGLUFFN(nnx.Module):
    "SwiGLU feed-forward (transformer_blocks.py:92-112): w12 -> silu-gate -> w3."

    def __init__(
        self,
        in_features: int,
        hidden_features: Optional[int] = None,
        out_features: Optional[int] = None,
        act_layer: Optional[Callable] = None,
        drop: float = 0.0,
        bias: bool = True,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.w12 = LinearX(in_features, 2 * hidden_features, use_bias=bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.w3 = LinearX(hidden_features, out_features, use_bias=bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        x12 = self.w12(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return self.w3(jax.nn.silu(x1) * x2)


class SwiGLUFFNFused(SwiGLUFFN):
    "SwiGLU with the DINOv2 hidden rounding (transformer_blocks.py:115-133)."

    def __init__(
        self,
        in_features: int,
        hidden_features: Optional[int] = None,
        out_features: Optional[int] = None,
        act_layer: Optional[Callable] = None,
        drop: float = 0.0,
        bias: bool = True,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        hidden_features = (int(hidden_features * 2 / 3) + 7) // 8 * 8
        super().__init__(
            in_features,
            hidden_features=hidden_features,
            out_features=out_features,
            bias=bias,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )


class LayerScale(nnx.Module):
    "Per-channel learned scaling (transformer_blocks.py:389-412)."

    def __init__(self, dim: int, init_values: float = 1e-5, *, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.gamma = nnx.Param(init_values * jnp.ones((dim,), dtype=param_dtype))

    def __call__(self, x):
        return x * self.gamma[...].astype(x.dtype)


class DropPath(nnx.Module):
    "Stochastic depth per sample (transformer_blocks.py:38-63)."

    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True, *, rngs: Optional[nnx.Rngs] = None):
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep
        self.rngs = rngs
        self.deterministic = False

    def __call__(self, x):
        if self.drop_prob == 0.0 or self.deterministic or self.rngs is None:
            return x
        keep_prob = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.rngs.dropout(), keep_prob, shape).astype(x.dtype)
        if keep_prob > 0.0 and self.scale_by_keep:
            mask = mask / keep_prob
        return x * mask


class RMSNorm(nnx.Module):
    "RMSNorm with fp32 statistics (transformer_blocks.py:658-679)."

    def __init__(self, dim: int, eps: float = 1e-6, elementwise_affine: bool = True, *, param_dtype=jnp.float32, rngs: Optional[nnx.Rngs] = None):
        self.dim = dim
        self.eps = eps
        self.elementwise_affine = elementwise_affine
        if elementwise_affine:
            self.weight = nnx.Param(jnp.ones((dim,), dtype=param_dtype))
        else:
            self.weight = None

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        out = (xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)).astype(x.dtype)
        if self.weight is not None:
            out = out * self.weight[...].astype(x.dtype)
        return out


def _apply_token_count_scalings(q, n_tokens, use_scalable_softmax, use_entropy_scaling, base_count, growth_factor):
    """SSMax / entropy scaling as static query pre-scales.

    The token count is a static shape under jit, so the scale folds into a
    compile-time constant (transformer_blocks.py:231-241).
    """
    if use_scalable_softmax:
        q = q * math.log(n_tokens)
    if use_entropy_scaling:
        q = q * math.sqrt(growth_factor * math.log(n_tokens) / math.log(base_count))
    return q


def _token_count_scale_factor(n_tokens, use_scalable_softmax, use_entropy_scaling, base_count, growth_factor):
    "The scalar the scalings above multiply q by (folds into the softmax scale)."
    f = 1.0
    if use_scalable_softmax:
        f *= math.log(n_tokens)
    if use_entropy_scaling:
        f *= math.sqrt(growth_factor * math.log(n_tokens) / math.log(base_count))
    return f


def _fused_attention_applicable(mod, n_kv: int) -> bool:
    """Whether the fused qkv+RoPE+attention Pallas kernel covers this module.

    Requirements: UNICEPTION_TPU_ATTN=fused, running on TPU, plain q/k paths
    (no qk_norm), positional encoding absent or exactly Rope2D, head_dim a
    multiple of 4, and a key count whose fp32 score tile fits VMEM.
    """
    from uniception_tpu.models.utils.config import get_attention_impl
    from uniception_tpu.ops.attention import get_sequence_parallel
    from uniception_tpu.ops.rope import Rope2D

    if get_attention_impl() != "fused" or get_sequence_parallel() is not None:
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not (on_tpu or os.environ.get("UNICEPTION_TPU_PALLAS_INTERPRET") == "1"):
        return False
    pe = mod.custom_positional_encoding
    projs = [getattr(mod, a) for a in ("qkv", "projq", "projk", "projv") if hasattr(mod, a)]
    return (
        all(isinstance(p, nnx.Linear) for p in projs)  # int8-quantized projections have no bf16 kernel to fuse
        and isinstance(mod.q_norm, Identity)
        and isinstance(mod.k_norm, Identity)
        and (pe is None or isinstance(pe, Rope2D))
        and mod.head_dim % 4 == 0
        and n_kv <= 2048
    )


class Attention(nnx.Module):
    "Self-attention layer (transformer_blocks.py:136-257)."

    def __init__(
        self,
        dim: int,
        latent_attn_dim: Optional[int] = None,
        num_heads: int = 8,
        qkv_bias: bool = False,
        qk_norm: bool = False,
        attn_drop: float = 0.0,
        proj_drop: float = 0.0,
        norm_layer: Callable = make_norm_layer,
        custom_positional_encoding: Optional[Callable] = None,
        use_scalable_softmax: bool = False,
        use_entropy_scaling: bool = False,
        base_token_count_for_entropy_scaling: int = 444,
        entropy_scaling_growth_factor: float = 1.4,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        if latent_attn_dim is not None:
            assert latent_attn_dim % num_heads == 0, "latent_attn_dim should be divisible by num_heads"
            self.latent_attn = True
            inner_dim = latent_attn_dim
        else:
            assert dim % num_heads == 0, "dim should be divisible by num_heads"
            self.latent_attn = False
            inner_dim = dim

        self.num_heads = num_heads
        self.head_dim = inner_dim // num_heads
        self.scale = self.head_dim**-0.5

        self.qkv = LinearX(dim, inner_dim * 3, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_norm = norm_layer(self.head_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if qk_norm else Identity()
        self.k_norm = norm_layer(self.head_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if qk_norm else Identity()
        self.attn_drop = attn_drop
        self.proj = LinearX(inner_dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj_drop = nnx.Dropout(proj_drop, rngs=rngs)

        self.custom_positional_encoding = custom_positional_encoding
        self.use_scalable_softmax = use_scalable_softmax
        self.use_entropy_scaling = use_entropy_scaling
        self.base_token_count_for_entropy_scaling = base_token_count_for_entropy_scaling
        self.entropy_scaling_growth_factor = entropy_scaling_growth_factor

    def __call__(self, x: jnp.ndarray, xpos: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, N, C = x.shape
        if not self.latent_attn and _fused_attention_applicable(self, N):
            from uniception_tpu.ops.fused_attention import fused_qkv_rope_attention

            pe = self.custom_positional_encoding
            if pe is not None:
                assert xpos is not None, "xpos required when using custom positional encoding"
            scale = self.scale * _token_count_scale_factor(
                N,
                self.use_scalable_softmax,
                self.use_entropy_scaling,
                self.base_token_count_for_entropy_scaling,
                self.entropy_scaling_growth_factor,
            )
            w = self.qkv.kernel[...].astype(x.dtype)
            b = self.qkv.bias[...] if self.qkv.bias is not None else jnp.zeros((w.shape[1],), x.dtype)
            out = fused_qkv_rope_attention(
                x, w, b,
                xpos if pe is not None else None,
                self.num_heads, scale,
                pe.base if pe is not None else 100.0,
                pe.F0 if pe is not None else 1.0,
            )
            return self.proj_drop(self.proj(out))
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        q, k = self.q_norm(q), self.k_norm(k)

        if self.custom_positional_encoding is not None:
            assert xpos is not None, "xpos required when using custom positional encoding"
            q = self.custom_positional_encoding(q, xpos)
            k = self.custom_positional_encoding(k, xpos)

        q = _apply_token_count_scalings(
            q,
            N,
            self.use_scalable_softmax,
            self.use_entropy_scaling,
            self.base_token_count_for_entropy_scaling,
            self.entropy_scaling_growth_factor,
        )

        x = scaled_dot_product_attention(q, k, v, scale=self.scale)
        # named for selective remat (UNICEPTION_TPU_REMAT_POLICY=attn_out:
        # save only the attention outputs, recompute the cheap projections)
        x = checkpoint_name(x, "attn_out")
        x = x.reshape(B, N, self.num_heads * self.head_dim)
        x = self.proj(x)
        x = self.proj_drop(x)
        return x


class CrossAttention(nnx.Module):
    "Cross-attention layer (transformer_blocks.py:260-386)."

    def __init__(
        self,
        dim: int,
        num_heads: int = 8,
        qkv_bias: bool = False,
        qk_norm: bool = False,
        attn_drop: float = 0.0,
        proj_drop: float = 0.0,
        norm_layer: Callable = make_norm_layer,
        custom_positional_encoding: Optional[Callable] = None,
        use_scalable_softmax: bool = False,
        use_entropy_scaling: bool = False,
        base_token_count_for_entropy_scaling: int = 444,
        entropy_scaling_growth_factor: float = 1.4,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        assert dim % num_heads == 0, "dim should be divisible by num_heads"
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5

        self.projq = LinearX(dim, dim, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.projk = LinearX(dim, dim, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.projv = LinearX(dim, dim, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_norm = norm_layer(self.head_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if qk_norm else Identity()
        self.k_norm = norm_layer(self.head_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if qk_norm else Identity()
        self.attn_drop = attn_drop
        self.proj = LinearX(dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj_drop = nnx.Dropout(proj_drop, rngs=rngs)

        self.custom_positional_encoding = custom_positional_encoding
        self.use_scalable_softmax = use_scalable_softmax
        self.use_entropy_scaling = use_entropy_scaling
        self.base_token_count_for_entropy_scaling = base_token_count_for_entropy_scaling
        self.entropy_scaling_growth_factor = entropy_scaling_growth_factor

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        qpos: Optional[jnp.ndarray] = None,
        kpos: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, Nq, C = query.shape
        Nk = key.shape[1]
        Nv = value.shape[1]

        # the fused kernel projects k and v from one source tensor, so it
        # only applies when the caller passes the same array for both (the
        # decoder/info-sharing pattern)
        if key is value and _fused_attention_applicable(self, Nk):
            from uniception_tpu.ops.fused_attention import fused_cross_rope_attention

            pe = self.custom_positional_encoding
            if pe is not None:
                assert qpos is not None and kpos is not None, "qpos/kpos required with custom positional encoding"
            scale = self.scale * _token_count_scale_factor(
                Nq,
                self.use_scalable_softmax,
                self.use_entropy_scaling,
                self.base_token_count_for_entropy_scaling,
                self.entropy_scaling_growth_factor,
            )
            dt = query.dtype
            wq = self.projq.kernel[...].astype(dt)
            wkv = jnp.concatenate([self.projk.kernel[...], self.projv.kernel[...]], axis=1).astype(dt)
            zeros = lambda n: jnp.zeros((n,), dt)
            bq = self.projq.bias[...] if self.projq.bias is not None else zeros(wq.shape[1])
            bkv = (
                jnp.concatenate([self.projk.bias[...], self.projv.bias[...]])
                if self.projk.bias is not None
                else zeros(wkv.shape[1])
            )
            out = fused_cross_rope_attention(
                query, key, wq, wkv, bq, bkv,
                qpos if pe is not None else None,
                kpos if pe is not None else None,
                self.num_heads, scale,
                pe.base if pe is not None else 100.0,
                pe.F0 if pe is not None else 1.0,
            )
            return self.proj_drop(self.proj(out))

        q = self.projq(query).reshape(B, Nq, self.num_heads, self.head_dim)
        k = self.projk(key).reshape(B, Nk, self.num_heads, self.head_dim)
        v = self.projv(value).reshape(B, Nv, self.num_heads, self.head_dim)
        q, k = self.q_norm(q), self.k_norm(k)

        if self.custom_positional_encoding is not None:
            assert qpos is not None, "qpos required when using custom positional encoding"
            assert kpos is not None, "kpos required when using custom positional encoding"
            q = self.custom_positional_encoding(q, qpos)
            k = self.custom_positional_encoding(k, kpos)

        q = _apply_token_count_scalings(
            q,
            Nq,
            self.use_scalable_softmax,
            self.use_entropy_scaling,
            self.base_token_count_for_entropy_scaling,
            self.entropy_scaling_growth_factor,
        )

        x = scaled_dot_product_attention(q, k, v, scale=self.scale)
        x = checkpoint_name(x, "attn_out")
        x = x.reshape(B, Nq, C)
        x = self.proj(x)
        x = self.proj_drop(x)
        return x


class SelfAttentionBlock(nnx.Module):
    """Pre-norm self-attention block (transformer_blocks.py:415-514).

    Also serves as the CroCo encoder Block (libs/croco/blocks.py:133-161):
    identical math and state-dict names when init_values/drop_path are unset.
    """

    def __init__(
        self,
        dim: int,
        num_heads: int,
        latent_attn_dim: Optional[int] = None,
        mlp_ratio: float = 4.0,
        qkv_bias: bool = False,
        qk_norm: bool = False,
        proj_drop: float = 0.0,
        attn_drop: float = 0.0,
        init_values: Optional[float] = None,
        drop_path: float = 0.0,
        act_layer: Callable = gelu_exact,
        norm_layer: Callable = make_norm_layer,
        mlp_layer=Mlp,
        custom_positional_encoding: Optional[Callable] = None,
        use_scalable_softmax: bool = False,
        use_entropy_scaling: bool = False,
        base_token_count_for_entropy_scaling: int = 444,
        entropy_scaling_growth_factor: float = 1.4,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.norm1 = norm_layer(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.attn = Attention(
            dim,
            latent_attn_dim=latent_attn_dim,
            num_heads=num_heads,
            qkv_bias=qkv_bias,
            qk_norm=qk_norm,
            attn_drop=attn_drop,
            proj_drop=proj_drop,
            norm_layer=norm_layer,
            custom_positional_encoding=custom_positional_encoding,
            use_scalable_softmax=use_scalable_softmax,
            use_entropy_scaling=use_entropy_scaling,
            base_token_count_for_entropy_scaling=base_token_count_for_entropy_scaling,
            entropy_scaling_growth_factor=entropy_scaling_growth_factor,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.ls1 = LayerScale(dim, init_values=init_values, param_dtype=param_dtype, rngs=rngs) if init_values else Identity()
        self.drop_path1 = DropPath(drop_path, rngs=rngs) if drop_path > 0.0 else Identity()

        self.norm2 = norm_layer(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.mlp = mlp_layer(
            in_features=dim,
            hidden_features=int(dim * mlp_ratio),
            act_layer=act_layer,
            drop=proj_drop,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.ls2 = LayerScale(dim, init_values=init_values, param_dtype=param_dtype, rngs=rngs) if init_values else Identity()
        self.drop_path2 = DropPath(drop_path, rngs=rngs) if drop_path > 0.0 else Identity()

        self.custom_positional_encoding = custom_positional_encoding

    def __call__(self, x: jnp.ndarray, xpos: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.custom_positional_encoding is not None:
            assert xpos is not None, "xpos required when using custom positional encoding"
        x = x + self.drop_path1(self.ls1(self.attn(self.norm1(x), xpos)))
        x = x + self.drop_path2(self.ls2(self.mlp(self.norm2(x))))
        return x


class CrossAttentionBlock(nnx.Module):
    """Pre-norm self+cross attention block (transformer_blocks.py:517-647).

    Also covers the CroCo DecoderBlock semantics (libs/croco/blocks.py:214-249).
    """

    def __init__(
        self,
        dim: int,
        num_heads: int,
        mlp_ratio: float = 4.0,
        qkv_bias: bool = False,
        qk_norm: bool = False,
        proj_drop: float = 0.0,
        attn_drop: float = 0.0,
        init_values: Optional[float] = None,
        drop_path: float = 0.0,
        act_layer: Callable = gelu_exact,
        norm_layer: Callable = make_norm_layer,
        mlp_layer=Mlp,
        custom_positional_encoding: Optional[Callable] = None,
        norm_cross_tokens: bool = True,
        use_scalable_softmax: bool = False,
        use_entropy_scaling: bool = False,
        base_token_count_for_entropy_scaling: int = 444,
        entropy_scaling_growth_factor: float = 1.4,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        common = dict(
            num_heads=num_heads,
            qkv_bias=qkv_bias,
            qk_norm=qk_norm,
            attn_drop=attn_drop,
            proj_drop=proj_drop,
            norm_layer=norm_layer,
            custom_positional_encoding=custom_positional_encoding,
            use_scalable_softmax=use_scalable_softmax,
            use_entropy_scaling=use_entropy_scaling,
            base_token_count_for_entropy_scaling=base_token_count_for_entropy_scaling,
            entropy_scaling_growth_factor=entropy_scaling_growth_factor,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.norm1 = norm_layer(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.attn = Attention(dim, **common)
        self.ls1 = LayerScale(dim, init_values=init_values, param_dtype=param_dtype, rngs=rngs) if init_values else Identity()
        self.drop_path1 = DropPath(drop_path, rngs=rngs) if drop_path > 0.0 else Identity()

        self.norm_y = norm_layer(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if norm_cross_tokens else Identity()
        self.custom_positional_encoding = custom_positional_encoding
        self.norm2 = norm_layer(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.cross_attn = CrossAttention(dim, **common)
        self.ls2 = LayerScale(dim, init_values=init_values, param_dtype=param_dtype, rngs=rngs) if init_values else Identity()
        self.drop_path2 = DropPath(drop_path, rngs=rngs) if drop_path > 0.0 else Identity()

        self.norm3 = norm_layer(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.mlp = mlp_layer(
            in_features=dim,
            hidden_features=int(dim * mlp_ratio),
            act_layer=act_layer,
            drop=proj_drop,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.ls3 = LayerScale(dim, init_values=init_values, param_dtype=param_dtype, rngs=rngs) if init_values else Identity()
        self.drop_path3 = DropPath(drop_path, rngs=rngs) if drop_path > 0.0 else Identity()

    def __call__(
        self,
        x: jnp.ndarray,
        y: jnp.ndarray,
        xpos: Optional[jnp.ndarray] = None,
        ypos: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.custom_positional_encoding is not None:
            assert xpos is not None, "xpos required when using custom positional encoding"
            assert ypos is not None, "ypos required when using custom positional encoding"
        x = x + self.drop_path1(self.ls1(self.attn(self.norm1(x), xpos)))
        y_ = self.norm_y(y)
        x = x + self.drop_path2(self.ls2(self.cross_attn(self.norm2(x), y_, y_, xpos, ypos)))
        x = x + self.drop_path3(self.ls3(self.mlp(self.norm3(x))))
        return x


def lambda_init_fn(depth):
    "DiffTransformer lambda schedule (transformer_blocks.py:682-683)."
    return 0.8 - 0.6 * math.exp(-0.3 * depth)


class DiffAttention(nnx.Module):
    """Differential self-attention (arXiv:2410.05258; transformer_blocks.py:686-804).

    Intentional deviation from the reference: the torch implementation
    reshapes the (B, H, N, 2*Dh) attention output directly to (B, N, C)
    without transposing heads to the front (transformer_blocks.py:800),
    which scrambles tokens across heads for num_heads > 1 — the cross
    variant transposes correctly (transformer_blocks.py:931-932). This
    implementation uses the correct (transposed) semantics for both; for
    num_heads == 1 the two coincide and parity tests pass exactly.
    """

    def __init__(
        self,
        dim: int,
        depth: int,
        num_heads: int = 8,
        qkv_bias: bool = False,
        qk_norm: bool = False,
        attn_drop: float = 0.0,
        proj_drop: float = 0.0,
        norm_layer: Callable = make_norm_layer,
        custom_positional_encoding: Optional[Callable] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        assert dim % num_heads == 0, "dim should be divisible by num_heads"
        self.num_heads = num_heads
        self.head_dim = dim // num_heads // 2
        self.scale = self.head_dim**-0.5

        self.qkv = LinearX(dim, dim * 3, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_norm = norm_layer(self.head_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if qk_norm else Identity()
        self.k_norm = norm_layer(self.head_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if qk_norm else Identity()
        self.proj = LinearX(dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj_drop = nnx.Dropout(proj_drop, rngs=rngs)

        self.custom_positional_encoding = custom_positional_encoding

        self.lambda_init = lambda_init_fn(depth)
        normal01 = jax.nn.initializers.normal(stddev=0.1)
        self.lambda_q1 = nnx.Param(normal01(rngs.params(), (self.head_dim,), jnp.float32))
        self.lambda_k1 = nnx.Param(normal01(rngs.params(), (self.head_dim,), jnp.float32))
        self.lambda_q2 = nnx.Param(normal01(rngs.params(), (self.head_dim,), jnp.float32))
        self.lambda_k2 = nnx.Param(normal01(rngs.params(), (self.head_dim,), jnp.float32))

        self.subln = RMSNorm(2 * self.head_dim, eps=1e-5, elementwise_affine=True, param_dtype=param_dtype, rngs=rngs)

    def _lambda_full(self, dt):
        l1 = jnp.exp(jnp.sum(self.lambda_q1[...] * self.lambda_k1[...])).astype(dt)
        l2 = jnp.exp(jnp.sum(self.lambda_q2[...] * self.lambda_k2[...])).astype(dt)
        return l1 - l2 + self.lambda_init

    def __call__(self, x: jnp.ndarray, xpos: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim * 2)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        # split each head's doubled dim into two sub-heads -> (B, N, 2H, Dh)
        q = q.reshape(B, N, 2 * self.num_heads, self.head_dim)
        k = k.reshape(B, N, 2 * self.num_heads, self.head_dim)
        v = v.reshape(B, N, self.num_heads, 2 * self.head_dim)

        q, k = self.q_norm(q), self.k_norm(k)

        if self.custom_positional_encoding is not None:
            assert xpos is not None, "xpos required when using custom positional encoding"
            q = self.custom_positional_encoding(q, xpos)
            k = self.custom_positional_encoding(k, xpos)

        # The sub-head split is first-half/second-half of the 2H axis (the
        # reference's q.chunk(2, dim=heads) after the (B, N, 2H, Dh) view).
        q1, q2 = q[:, :, : self.num_heads], q[:, :, self.num_heads :]
        k1, k2 = k[:, :, : self.num_heads], k[:, :, self.num_heads :]

        a1 = scaled_dot_product_attention(q1, k1, v, scale=self.scale)
        a2 = scaled_dot_product_attention(q2, k2, v, scale=self.scale)

        lam = self._lambda_full(q.dtype)
        attn = a1 - lam * a2  # (B, N, H, 2Dh)
        attn = self.subln(attn)
        attn = attn * (1 - self.lambda_init)
        attn = attn.reshape(B, N, self.num_heads * 2 * self.head_dim)

        x = self.proj(attn)
        x = self.proj_drop(x)
        return x


class DiffCrossAttention(nnx.Module):
    "Differential cross-attention (transformer_blocks.py:807-945)."

    def __init__(
        self,
        dim: int,
        depth: int,
        num_heads: int = 8,
        qkv_bias: bool = False,
        qk_norm: bool = False,
        attn_drop: float = 0.0,
        proj_drop: float = 0.0,
        norm_layer: Callable = make_norm_layer,
        custom_positional_encoding: Optional[Callable] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        assert dim % num_heads == 0, "dim should be divisible by num_heads"
        self.num_heads = num_heads
        self.head_dim = dim // num_heads // 2
        self.scale = self.head_dim**-0.5

        self.projq = LinearX(dim, dim, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.projk = LinearX(dim, dim, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.projv = LinearX(dim, dim, use_bias=qkv_bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.q_norm = norm_layer(self.head_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if qk_norm else Identity()
        self.k_norm = norm_layer(self.head_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if qk_norm else Identity()
        self.proj = LinearX(dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.proj_drop = nnx.Dropout(proj_drop, rngs=rngs)

        self.lambda_init = lambda_init_fn(depth)
        normal01 = jax.nn.initializers.normal(stddev=0.1)
        self.lambda_q1 = nnx.Param(normal01(rngs.params(), (self.head_dim,), jnp.float32))
        self.lambda_k1 = nnx.Param(normal01(rngs.params(), (self.head_dim,), jnp.float32))
        self.lambda_q2 = nnx.Param(normal01(rngs.params(), (self.head_dim,), jnp.float32))
        self.lambda_k2 = nnx.Param(normal01(rngs.params(), (self.head_dim,), jnp.float32))

        self.subln = RMSNorm(2 * self.head_dim, eps=1e-5, elementwise_affine=True, param_dtype=param_dtype, rngs=rngs)
        self.custom_positional_encoding = custom_positional_encoding

    def _lambda_full(self, dt):
        l1 = jnp.exp(jnp.sum(self.lambda_q1[...] * self.lambda_k1[...])).astype(dt)
        l2 = jnp.exp(jnp.sum(self.lambda_q2[...] * self.lambda_k2[...])).astype(dt)
        return l1 - l2 + self.lambda_init

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        qpos: Optional[jnp.ndarray] = None,
        kpos: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, Nq, C = query.shape
        Nk = key.shape[1]
        Nv = value.shape[1]

        q = self.projq(query).reshape(B, Nq, 2 * self.num_heads, self.head_dim)
        k = self.projk(key).reshape(B, Nk, 2 * self.num_heads, self.head_dim)
        v = self.projv(value).reshape(B, Nv, self.num_heads, 2 * self.head_dim)
        q, k = self.q_norm(q), self.k_norm(k)

        if self.custom_positional_encoding is not None:
            assert qpos is not None and kpos is not None, "qpos/kpos required with custom positional encoding"
            q = self.custom_positional_encoding(q, qpos)
            k = self.custom_positional_encoding(k, kpos)

        q1, q2 = q[:, :, : self.num_heads], q[:, :, self.num_heads :]
        k1, k2 = k[:, :, : self.num_heads], k[:, :, self.num_heads :]

        a1 = scaled_dot_product_attention(q1, k1, v, scale=self.scale)
        a2 = scaled_dot_product_attention(q2, k2, v, scale=self.scale)

        lam = self._lambda_full(q.dtype)
        attn = a1 - lam * a2
        attn = self.subln(attn)
        attn = attn * (1 - self.lambda_init)
        attn = attn.reshape(B, Nq, self.num_heads * 2 * self.head_dim)

        x = self.proj(attn)
        x = self.proj_drop(x)
        return x


class DiffSelfAttentionBlock(SelfAttentionBlock):
    "Self-attention block with differential attention (transformer_blocks.py:948-994)."

    def __init__(self, dim, depth, num_heads, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32, **kw):
        diff_kw = {
            k: kw.get(k)
            for k in ("qkv_bias", "qk_norm", "attn_drop", "proj_drop", "norm_layer", "custom_positional_encoding")
            if k in kw
        }
        super().__init__(dim=dim, num_heads=num_heads, dtype=dtype, param_dtype=param_dtype, rngs=rngs, **kw)
        self.attn = DiffAttention(dim, depth, num_heads=num_heads, dtype=dtype, param_dtype=param_dtype, rngs=rngs, **diff_kw)


class DiffCrossAttentionBlock(CrossAttentionBlock):
    "Cross-attention block with differential cross-attention (transformer_blocks.py:997-1045)."

    def __init__(self, dim, depth, num_heads, *, rngs: nnx.Rngs, dtype=None, param_dtype=jnp.float32, **kw):
        diff_kw = {
            k: kw.get(k)
            for k in ("qkv_bias", "qk_norm", "attn_drop", "proj_drop", "norm_layer", "custom_positional_encoding")
            if k in kw
        }
        super().__init__(dim=dim, num_heads=num_heads, dtype=dtype, param_dtype=param_dtype, rngs=rngs, **kw)
        self.cross_attn = DiffCrossAttention(dim, depth, num_heads=num_heads, dtype=dtype, param_dtype=param_dtype, rngs=rngs, **diff_kw)
