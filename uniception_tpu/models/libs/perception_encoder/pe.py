"""
Meta Perception Encoder (PE) vision transformer, TPU-native.

Behavioral parity with the reference's vendored implementation
(uniception/models/libs/perception_encoder/vision_encoder/pe.py:33-563 and
rope.py:36-322): CLIP-style ViT with optional cls token, absolute PE with
bilinear interpolation, axial interleaved-pair RoPE2D (lucidrains
convention: per-axis frequencies repeated over adjacent channel pairs,
x-axis first, cls token unrotated), LayerScale, attention pooling.

State-dict keys match the torch model (transformer.resblocks.N.attn.
in_proj_weight / out_proj, mlp.c_fc / c_proj, ln_1/ln_2, ls_1.gamma,
class_embedding, positional_embedding, conv1, proj) so PE checkpoints load
directly; the packed in_proj weight is stored in torch (3E, E) layout.
"""

import math
from dataclasses import dataclass, replace
from typing import Callable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from uniception_tpu.nn.blocks import layer_norm_factory
from uniception_tpu.nn.common import Identity, gelu_exact
from uniception_tpu.ops.attention import scaled_dot_product_attention
from uniception_tpu.ops.resize import interpolate

__all__ = [
    "PEConfig",
    "PETextConfig",
    "PE_VISION_CONFIG",
    "PE_TEXT_CONFIG",
    "VisionTransformer",
    "TextTransformer",
    "CLIP",
    "PERope2D",
]


@dataclass
class PEConfig:
    "Vision tower config (reference config.py:29-52)."

    patch_size: int
    width: int
    layers: int
    heads: int
    mlp_ratio: float
    output_dim: Optional[int]
    ls_init_value: Optional[float] = None
    drop_path: float = 0.0
    image_size: int = 224
    use_abs_posemb: bool = True
    use_cls_token: bool = False
    use_rope2d: bool = True
    pool_type: str = "attn"
    attn_pooler_heads: int = 8
    use_ln_pre: bool = True
    use_ln_post: bool = True


PE_VISION_CONFIG = {}
PE_VISION_CONFIG["PE-Core-G14-448"] = PEConfig(
    image_size=448, patch_size=14, width=1536, layers=50, heads=16, mlp_ratio=8960 / 1536,
    pool_type="attn", output_dim=1280, use_cls_token=False,
)
PE_VISION_CONFIG["PE-Core-L14-336"] = PEConfig(
    image_size=336, patch_size=14, width=1024, layers=24, heads=16, mlp_ratio=4.0,
    pool_type="attn", output_dim=1024, use_cls_token=True,
)
PE_VISION_CONFIG["PE-Core-B16-224"] = PEConfig(
    image_size=224, patch_size=16, width=768, layers=12, heads=12, mlp_ratio=4.0,
    pool_type="attn", output_dim=1024, use_cls_token=True,
)
PE_VISION_CONFIG["PE-Lang-G14-448"] = replace(
    PE_VISION_CONFIG["PE-Core-G14-448"], image_size=448, pool_type="none", use_ln_post=False,
    output_dim=None, ls_init_value=0.1, layers=47,
)
PE_VISION_CONFIG["PE-Lang-L14-448"] = replace(
    PE_VISION_CONFIG["PE-Core-L14-336"], image_size=448, pool_type="none", use_ln_post=False,
    output_dim=None, ls_init_value=0.1, layers=23,
)
PE_VISION_CONFIG["PE-Spatial-G14-448"] = replace(
    PE_VISION_CONFIG["PE-Core-G14-448"], image_size=448, pool_type="none", use_ln_post=False, output_dim=None,
)


@dataclass
class PETextConfig:
    "Text tower config (reference config.py:56-67)."

    context_length: int
    width: int
    heads: int
    layers: int
    output_dim: int
    mlp_ratio: float = 4.0
    vocab_size: int = 49408


PE_TEXT_CONFIG = {}
PE_TEXT_CONFIG["PE-Core-G14-448"] = PETextConfig(context_length=72, width=1280, heads=20, layers=24, output_dim=1280)
PE_TEXT_CONFIG["PE-Core-L14-336"] = PETextConfig(context_length=32, width=1024, heads=16, layers=24, output_dim=1024)
PE_TEXT_CONFIG["PE-Core-B16-224"] = PE_TEXT_CONFIG["PE-Core-L14-336"]


def _rotate_half_interleaved(x):
    "lucidrains rotate_half: adjacent channel pairs (rope.py:36-41)."
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rotary_emb(freqs, t):
    "t * cos + rotate_half(t) * sin (rope.py:44-63), fp32 rotation."
    dt = t.dtype
    tf = t.astype(jnp.float32)
    out = tf * jnp.cos(freqs) + _rotate_half_interleaved(tf) * jnp.sin(freqs)
    return out.astype(dt)


class PERope2D:
    "Axial 2D RoPE with interleaved pairs (reference rope.py:281-322)."

    def __init__(self, dim: int, use_cls_token: bool = False, theta: float = 10000.0):
        self.dim = dim  # head dim
        self.use_cls_token = use_cls_token
        self.theta = theta

    def freqs_for_grid(self, grid_h: int, grid_w: int) -> jnp.ndarray:
        "(1, 1, N, dim) frequency table; cls token (if any) gets zeros."
        d_axis = self.dim // 2  # per-axis rot dim
        inv = 1.0 / self.theta ** (np.arange(0, d_axis, 2)[: d_axis // 2] / d_axis)  # (d_axis/2,)
        offset = 1 if self.use_cls_token else 0
        ys = np.arange(grid_h) + offset
        xs = np.arange(grid_w) + offset
        fy = np.repeat(ys[:, None] * inv[None, :], 2, axis=-1)  # (H, d_axis)
        fx = np.repeat(xs[:, None] * inv[None, :], 2, axis=-1)  # (W, d_axis)
        fy_grid = np.broadcast_to(fy[:, None, :], (grid_h, grid_w, d_axis))
        fx_grid = np.broadcast_to(fx[None, :, :], (grid_h, grid_w, d_axis))
        freq = np.concatenate([fx_grid, fy_grid], axis=-1).reshape(grid_h * grid_w, self.dim)
        if self.use_cls_token:
            freq = np.concatenate([np.zeros((1, self.dim)), freq], axis=0)
        return jnp.asarray(freq[None, None], jnp.float32)  # (1, 1, N, dim)

    def __call__(self, q, k, grid_hw):
        "q, k: (B, N, H, D) — note the library-wide BNHD layout."
        freqs = self.freqs_for_grid(*grid_hw)  # (1, 1, N, D)
        freqs = jnp.transpose(freqs, (0, 2, 1, 3))  # (1, N, 1, D)
        return _apply_rotary_emb(freqs, q), _apply_rotary_emb(freqs, k)


class SelfAttention(nnx.Module):
    "Packed-qkv attention with PE RoPE (pe.py:89-140). Torch (3E, E) weight layout."

    def __init__(self, embed_dim: int, num_heads: int, rope: Optional[PERope2D] = None, *, param_dtype=jnp.float32, rngs):
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.scale = self.head_dim**-0.5
        xavier = jax.nn.initializers.xavier_uniform()
        self.in_proj_weight = nnx.Param(xavier(rngs.params(), (3 * embed_dim, embed_dim), param_dtype))
        self.in_proj_bias = nnx.Param(jnp.zeros((3 * embed_dim,), param_dtype))
        self.out_proj = nnx.Linear(embed_dim, embed_dim, use_bias=True, param_dtype=param_dtype, rngs=rngs)
        self.rope = rope

    def __call__(self, x, grid_hw=None, attn_mask=None):
        "attn_mask: optional additive (L, L) float mask (torch convention)."
        B, N, E = x.shape
        proj = x @ self.in_proj_weight[...].T.astype(x.dtype) + self.in_proj_bias[...].astype(x.dtype)
        q, k, v = jnp.split(proj, 3, axis=-1)
        q = q.reshape(B, N, self.num_heads, self.head_dim)
        k = k.reshape(B, N, self.num_heads, self.head_dim)
        v = v.reshape(B, N, self.num_heads, self.head_dim)
        if self.rope is not None:
            q, k = self.rope(q, k, grid_hw)
        if attn_mask is not None:
            # masked path (text tower, tiny L): explicit fp32 softmax
            logits = jnp.einsum("bnhd,bmhd->bhnm", q * self.scale, k).astype(jnp.float32)
            logits = logits + attn_mask.astype(jnp.float32)[None, None]
            attn = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(logits, axis=-1).astype(v.dtype), v)
        else:
            attn = scaled_dot_product_attention(q, k, v, scale=self.scale)
        return self.out_proj(attn.reshape(B, N, E))


class PELayerScale(nnx.Module):
    "LayerScale with PE's param name (pe.py:33-44)."

    def __init__(self, dim, init_values=1e-5, *, param_dtype=jnp.float32, rngs=None):
        self.gamma = nnx.Param(init_values * jnp.ones((dim,), param_dtype))

    def __call__(self, x):
        return x * self.gamma[...].astype(x.dtype)


class _PEMlp(nnx.Module):
    "MLP with c_fc / c_proj key names (pe.py:172-181)."

    def __init__(self, d_model, mlp_width, *, param_dtype=jnp.float32, rngs):
        self.c_fc = nnx.Linear(d_model, mlp_width, param_dtype=param_dtype, rngs=rngs)
        self.c_proj = nnx.Linear(mlp_width, d_model, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        return self.c_proj(gelu_exact(self.c_fc(x)))


class ResidualAttentionBlock(nnx.Module):
    "PE transformer block (pe.py:142-204)."

    def __init__(self, d_model, n_head, mlp_ratio=4.0, ls_init_value=None, rope=None, *, param_dtype=jnp.float32, rngs):
        norm = layer_norm_factory(eps=1e-5)
        self.attn = SelfAttention(d_model, n_head, rope=rope, param_dtype=param_dtype, rngs=rngs)
        self.ls_1 = PELayerScale(d_model, ls_init_value, param_dtype=param_dtype, rngs=rngs) if ls_init_value is not None else Identity()
        self.ls_2 = PELayerScale(d_model, ls_init_value, param_dtype=param_dtype, rngs=rngs) if ls_init_value is not None else Identity()
        self.ln_1 = norm(d_model, param_dtype=param_dtype, rngs=rngs)
        self.ln_2 = norm(d_model, param_dtype=param_dtype, rngs=rngs)
        self.mlp = _PEMlp(d_model, int(d_model * mlp_ratio), param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x, grid_hw=None, attn_mask=None):
        x = x + self.ls_1(self.attn(self.ln_1(x), grid_hw=grid_hw, attn_mask=attn_mask))
        x = x + self.ls_2(self.mlp(self.ln_2(x)))
        return x


class Transformer(nnx.Module):
    "Stack of PE blocks (pe.py:207-301)."

    def __init__(self, width, layers, heads, mlp_ratio=4.0, ls_init_value=None, rope=None, *, param_dtype=jnp.float32, rngs):
        self.width = width
        self.layers = layers
        self.resblocks = nnx.List(
            [
                ResidualAttentionBlock(width, heads, mlp_ratio, ls_init_value=ls_init_value, rope=rope, param_dtype=param_dtype, rngs=rngs)
                for _ in range(layers)
            ]
        )

    def truncate(self, layer_idx: int):
        self.layers = ((self.layers + layer_idx) % self.layers) + 1
        self.resblocks = nnx.List(list(self.resblocks)[: self.layers])

    def __call__(self, x, grid_hw=None, layer_idx: int = -1, attn_mask=None):
        stop_idx = (self.layers + layer_idx) % self.layers
        for i, blk in enumerate(self.resblocks):
            x = blk(x, grid_hw=grid_hw, attn_mask=attn_mask)
            if i == stop_idx:
                break
        return x

    def forward_intermediate(self, x, grid_hw=None, intermediate_layers: Union[int, List[int]] = 1):
        if isinstance(intermediate_layers, int):
            intermediate_layers = [len(self.resblocks) - intermediate_layers]
        outs = []
        for i, blk in enumerate(self.resblocks):
            x = blk(x, grid_hw=grid_hw)
            if i in intermediate_layers:
                outs.append(x)
        return outs


class AttentionPooling(nnx.Module):
    "Probe-token attention pool (pe.py:47-88). MHA stored in torch layout."

    def __init__(self, embed_dim, num_heads, num_probe=1, mlp_ratio=4, *, param_dtype=jnp.float32, rngs):
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.probe = nnx.Param(jax.random.normal(rngs.params(), (1, num_probe, embed_dim), param_dtype))
        self.attn = _TorchMHA(embed_dim, num_heads, param_dtype=param_dtype, rngs=rngs)
        self.layernorm = nnx.LayerNorm(embed_dim, epsilon=1e-5, param_dtype=param_dtype, rngs=rngs)
        self.mlp = _PEMlp(embed_dim, int(embed_dim * mlp_ratio), param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        B = x.shape[0]
        q = jnp.broadcast_to(self.probe[...].astype(x.dtype), (B,) + self.probe.shape[1:])
        x = self.attn(q, x, x)
        return x + self.mlp(self.layernorm(x))


class _TorchMHA(nnx.Module):
    "nn.MultiheadAttention-compatible cross attention (packed in_proj)."

    def __init__(self, embed_dim, num_heads, *, param_dtype=jnp.float32, rngs):
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        xavier = jax.nn.initializers.xavier_uniform()
        self.in_proj_weight = nnx.Param(xavier(rngs.params(), (3 * embed_dim, embed_dim), param_dtype))
        self.in_proj_bias = nnx.Param(jnp.zeros((3 * embed_dim,), param_dtype))
        self.out_proj = nnx.Linear(embed_dim, embed_dim, use_bias=True, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, q, k, v):
        E = self.embed_dim
        w = self.in_proj_weight[...].astype(q.dtype)
        b = self.in_proj_bias[...].astype(q.dtype)
        qp = q @ w[:E].T + b[:E]
        kp = k @ w[E : 2 * E].T + b[E : 2 * E]
        vp = v @ w[2 * E :].T + b[2 * E :]
        Bq, Nq, _ = qp.shape
        Nk = kp.shape[1]
        qp = qp.reshape(Bq, Nq, self.num_heads, self.head_dim)
        kp = kp.reshape(Bq, Nk, self.num_heads, self.head_dim)
        vp = vp.reshape(Bq, Nk, self.num_heads, self.head_dim)
        out = scaled_dot_product_attention(qp, kp, vp)
        return self.out_proj(out.reshape(Bq, Nq, E))


class VisionTransformer(nnx.Module):
    "PE vision transformer (pe.py:304-563)."

    def __init__(
        self,
        patch_size: int,
        width: int,
        layers: int,
        heads: int,
        mlp_ratio: float,
        use_ln_pre: bool = True,
        use_ln_post: bool = True,
        ls_init_value: Optional[float] = None,
        drop_path: float = 0.0,
        image_size: int = 448,
        use_abs_posemb: bool = True,
        use_rope2d: bool = True,
        use_cls_token: bool = False,
        output_dim: Optional[int] = 1280,
        attn_pooler_heads: int = 8,
        pool_type: str = "attn",
        *,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        assert pool_type in ("attn", "tok", "avg", "none")
        norm = layer_norm_factory(eps=1e-5)
        self.pool_type = pool_type
        self.patch_size = patch_size
        self.output_dim = output_dim or width
        self.proj_dim = output_dim
        self.heads = heads
        self.width = width
        self.layers = layers
        self.use_abs_posemb = use_abs_posemb
        self.use_cls_token = use_cls_token
        self.use_rope2d = use_rope2d
        self.image_size = image_size

        self.conv1 = nnx.Conv(
            3, width, kernel_size=(patch_size, patch_size), strides=(patch_size, patch_size),
            padding="VALID", use_bias=False, param_dtype=param_dtype, rngs=rngs,
        )
        self.rope = PERope2D(dim=width // heads, use_cls_token=use_cls_token) if use_rope2d else None
        self.ln_pre = norm(width, param_dtype=param_dtype, rngs=rngs) if use_ln_pre else Identity()
        self.ln_post = norm(width, param_dtype=param_dtype, rngs=rngs) if use_ln_post else Identity()
        self.transformer = Transformer(
            width, layers, heads, mlp_ratio, ls_init_value=ls_init_value, rope=self.rope,
            param_dtype=param_dtype, rngs=rngs,
        )
        if pool_type == "attn":
            self.attn_pool = AttentionPooling(width, attn_pooler_heads, param_dtype=param_dtype, rngs=rngs)
        else:
            self.attn_pool = None

        init_scale = width**-0.5
        if use_cls_token:
            self.class_embedding = nnx.Param(init_scale * jax.random.normal(rngs.params(), (width,), param_dtype))
        if use_abs_posemb:
            self.posemb_grid_size = image_size // patch_size
            self.positional_embedding = nnx.Param(
                init_scale * jax.random.normal(rngs.params(), (int(use_cls_token) + self.posemb_grid_size**2, width), param_dtype)
            )
        if self.proj_dim is not None:
            self.proj = nnx.Param(init_scale * jax.random.normal(rngs.params(), (width, self.proj_dim), param_dtype))

    @classmethod
    def from_config(cls, name: str, pretrained: bool = False, checkpoint_path: Optional[str] = None, *, rngs=None, **kwargs):
        if name not in PE_VISION_CONFIG:
            raise RuntimeError(f"{name} not found in configs.")
        from dataclasses import asdict

        args = asdict(PE_VISION_CONFIG[name])
        args.update(kwargs)
        model = cls(rngs=rngs, **args)
        if pretrained:
            assert checkpoint_path is not None, "offline build: pass checkpoint_path explicitly"
            from uniception_tpu.utils.checkpoint import load_checkpoint
            from uniception_tpu.utils.torch_compat import load_torch_state_dict

            ckpt = load_checkpoint(checkpoint_path)
            load_torch_state_dict(model, ckpt.get("model", ckpt), strict=False)
        return model

    def truncate(self, layer_idx: int):
        self.transformer.truncate(layer_idx)
        self.layers = self.transformer.layers

    def _sample_abs_posemb(self, grid_h: int, grid_w: int, dtype):
        "Bilinear PE interpolation (pe.py:458-479)."
        pe = self.positional_embedding[...].astype(jnp.float32)
        if self.posemb_grid_size == grid_h and self.posemb_grid_size == grid_w:
            return pe[None].astype(dtype)
        if self.use_cls_token:
            cls_pe, pe = pe[:1], pe[1:]
        grid = jnp.transpose(pe.reshape(1, self.posemb_grid_size, self.posemb_grid_size, -1), (0, 3, 1, 2))
        grid = interpolate(grid, size=(grid_h, grid_w), mode="bilinear", align_corners=False)
        pe = jnp.transpose(grid, (0, 2, 3, 1)).reshape(-1, self.width)
        if self.use_cls_token:
            pe = jnp.concatenate([cls_pe, pe], axis=0)
        return pe[None].astype(dtype)

    def _embed(self, x):
        B, _, h, w = x.shape
        grid_h, grid_w = h // self.patch_size, w // self.patch_size
        x = self.conv1(jnp.transpose(x, (0, 2, 3, 1))).reshape(B, grid_h * grid_w, self.width)
        if self.use_cls_token:
            cls = jnp.broadcast_to(self.class_embedding[...].reshape(1, 1, -1).astype(x.dtype), (B, 1, self.width))
            x = jnp.concatenate([cls, x], axis=1)
        if self.use_abs_posemb:
            x = x + self._sample_abs_posemb(grid_h, grid_w, x.dtype)
        x = self.ln_pre(x)
        return x, (grid_h, grid_w)

    def forward_features(self, x, norm: bool = False, layer_idx: int = -1, strip_cls_token: bool = False):
        x, grid_hw = self._embed(x)
        x = self.transformer(x, grid_hw=grid_hw, layer_idx=layer_idx)
        if norm:
            x = self.ln_post(x)
        if strip_cls_token and self.use_cls_token:
            x = x[:, 1:]
        return x

    def get_intermediate_layers(self, x, n: Union[int, List[int]] = 1, norm: bool = True, strip_cls_token: bool = False):
        x, grid_hw = self._embed(x)
        outs = self.transformer.forward_intermediate(x, grid_hw=grid_hw, intermediate_layers=n)
        if norm:
            outs = [self.ln_post(o) for o in outs]
        if strip_cls_token and self.use_cls_token:
            outs = [o[:, 1:] for o in outs]
        return outs

    def _pool(self, x):
        if self.pool_type == "tok":
            return x[:, 0]
        if self.pool_type == "avg":
            return jnp.mean(x, axis=1)
        if self.pool_type == "attn":
            return self.attn_pool(x)[:, 0]
        if self.pool_type == "none":
            return x
        raise NotImplementedError

    def __call__(self, x, **kwargs):
        x = self.forward_features(x, norm=True, **kwargs)
        x = self._pool(x)
        if self.proj_dim is not None:
            x = x @ self.proj[...].astype(x.dtype)
        return x


class TextTransformer(nnx.Module):
    """CLIP text tower (pe.py:565-703).

    Causal-masked transformer over BPE token ids with argmax (EOT-token)
    pooling and a linear projection to the shared embedding space. State
    keys match torch (token_embedding.weight, positional_embedding,
    transformer.resblocks.*, ln_final, text_projection).
    """

    def __init__(
        self,
        context_length: int = 72,
        vocab_size: int = 49408,
        width: int = 512,
        heads: int = 8,
        layers: int = 12,
        mlp_ratio: float = 4.0,
        ls_init_value: Optional[float] = None,
        output_dim: int = 1280,
        no_causal_mask: bool = False,
        pad_id: int = 0,
        pool_type: str = "argmax",
        proj_bias: bool = False,
        output_tokens: bool = False,
        use_ln_post: bool = True,
        *,
        param_dtype=jnp.float32,
        rngs=None,
        **_ignore,
    ):
        assert pool_type in ("first", "last", "argmax", "none")
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.pool_type = pool_type
        self.output_tokens = output_tokens
        self.num_pos = self.context_length = context_length
        self.vocab_size = vocab_size
        self.width = width
        self.output_dim = output_dim
        self.heads = heads
        self.pad_id = pad_id
        self.layers = layers
        self.causal = not no_causal_mask

        self.token_embedding = nnx.Embed(vocab_size, width, param_dtype=param_dtype, rngs=rngs)
        self.positional_embedding = nnx.Param(
            0.01 * jax.random.normal(rngs.params(), (self.num_pos, width), param_dtype)
        )
        self.transformer = Transformer(
            width=width, layers=layers, heads=heads, mlp_ratio=mlp_ratio,
            ls_init_value=ls_init_value, param_dtype=param_dtype, rngs=rngs,
        )
        norm = layer_norm_factory(eps=1e-5)
        self.ln_final = norm(width, param_dtype=param_dtype, rngs=rngs) if use_ln_post else Identity()
        if proj_bias:
            self.text_projection = nnx.Linear(width, output_dim, param_dtype=param_dtype, rngs=rngs)
        else:
            self.text_projection = nnx.Param(
                (width**-0.5) * jax.random.normal(rngs.params(), (width, output_dim), param_dtype)
            )

    def _causal_mask(self, seq_len):
        "Additive upper-triangular -inf mask (pe.py:633-639 build_causal_mask)."
        row = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
        return jnp.where(col > row, -jnp.inf, 0.0).astype(jnp.float32)

    def text_global_pool(self, x, text=None, pool_type: str = "argmax"):
        if pool_type == "first":
            return x[:, 0], x[:, 1:]
        if pool_type == "last":
            return x[:, -1], x[:, :-1]
        if pool_type == "argmax":
            # EOT token = highest id in each sequence (pe.py:668-680)
            assert text is not None
            idx = jnp.argmax(text, axis=-1)
            return x[jnp.arange(x.shape[0]), idx], x
        return x, x

    def __call__(self, text):
        "text: (B, L) int token ids -> (B, output_dim) pooled embedding."
        seq_len = text.shape[1]
        x = self.token_embedding(text)
        attn_mask = self._causal_mask(seq_len) if self.causal else None
        x = x + self.positional_embedding[...][:seq_len].astype(x.dtype)
        x = self.transformer(x, attn_mask=attn_mask)
        x = self.ln_final(x)
        pooled, tokens = self.text_global_pool(x, text, pool_type=self.pool_type)
        if isinstance(self.text_projection, nnx.Linear):
            pooled = self.text_projection(pooled)
        else:
            pooled = pooled @ self.text_projection[...].astype(pooled.dtype)
        if self.output_tokens:
            return pooled, tokens
        return pooled


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class CLIP(TextTransformer):
    "Joint image-text model (pe.py:704-752): text tower + `visual` + logit scale."

    def __init__(self, vision_cfg: PEConfig, text_cfg: PETextConfig, init_logit_scale: float = math.log(1 / 0.07), *, param_dtype=jnp.float32, rngs=None):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        super().__init__(param_dtype=param_dtype, rngs=rngs, **text_cfg.__dict__)
        self.visual = VisionTransformer(param_dtype=param_dtype, rngs=rngs, **vision_cfg.__dict__)
        self.image_size = self.visual.image_size
        self.logit_scale = nnx.Param(jnp.asarray(init_logit_scale, param_dtype))

    def encode_image(self, image, normalize: bool = False):
        x = self.visual(image)
        return _l2_normalize(x) if normalize else x

    def encode_video(self, video, normalize: bool = False):
        "video: (B, N, C, H, W) -> mean of per-frame embeddings."
        b, n, c, h, w = video.shape
        feats = self.encode_image(video.reshape(b * n, c, h, w), normalize=normalize)
        return feats.reshape(b, n, -1).mean(axis=1)

    def encode_text(self, text, normalize: bool = False):
        x = TextTransformer.__call__(self, text)
        return _l2_normalize(x) if normalize else x

    def __call__(self, image=None, text=None):
        image_features = self.encode_image(image, normalize=True) if image is not None else None
        text_features = self.encode_text(text, normalize=True) if text is not None else None
        return image_features, text_features, jnp.exp(self.logit_scale[...])

    @classmethod
    def from_config(cls, name: str, pretrained: bool = False, checkpoint_path: Optional[str] = None, *, rngs=None):
        if name not in PE_VISION_CONFIG or name not in PE_TEXT_CONFIG:
            raise RuntimeError(f"{name} not found in configs.")
        model = cls(PE_VISION_CONFIG[name], PE_TEXT_CONFIG[name], rngs=rngs)
        if pretrained:
            from uniception_tpu.utils.checkpoint import load_checkpoint
            from uniception_tpu.utils.torch_compat import load_torch_state_dict

            sd = load_checkpoint(checkpoint_path)
            sd = sd.get("state_dict", sd.get("weights", sd)) if isinstance(sd, dict) else sd
            load_torch_state_dict(model, {k.replace("module.", ""): v for k, v in sd.items()}, strict=False)
        return model

    @classmethod
    def available_configs(cls):
        return [k for k in PE_VISION_CONFIG if k in PE_TEXT_CONFIG]
