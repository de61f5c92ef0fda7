"""
Quantizers for the Cosmos discrete tokenizers.

Behavioral parity with reference
uniception/models/libs/cosmos_tokenizer/modules/quantizers.py:35-501:
FSQuantizer (finite scalar quantization, arXiv:2309.15505),
ResidualFSQuantizer (arXiv:2107.03312 Alg. 1), VectorQuantizer
(taming-transformers style) and LFQuantizer (lookup-free, magvit2 style).

All operate on (B, C, H, W) latents (channel-first, like the reference) and
use straight-through estimators for the rounding ops.
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

__all__ = ["FSQuantizer", "ResidualFSQuantizer", "VectorQuantizer", "LFQuantizer"]


def _round_ste(z):
    "Round with straight-through gradients."
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


class FSQuantizer(nnx.Module):
    "Finite scalar quantization (quantizers.py:68-212)."

    def __init__(self, levels: List[int], dim: Optional[int] = None, num_codebooks: int = 1, *, rngs=None, **ignore_kwargs):
        self._levels = np.asarray(levels, np.int32)
        self._basis = np.concatenate([[1], np.cumprod(levels[:-1])]).astype(np.int32)
        self.codebook_dim = len(levels)
        self.num_codebooks = num_codebooks
        self.effective_codebook_dim = self.codebook_dim * num_codebooks
        self.dim = dim if dim is not None else self.effective_codebook_dim
        assert self.dim == self.effective_codebook_dim, "projections not supported (unused in Cosmos configs)"
        self.codebook_size = int(np.prod(levels))

    def bound(self, z, eps: float = 1e-3):
        levels = jnp.asarray(self._levels, jnp.float32)
        half_l = (levels - 1) * (1 + eps) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z):
        quantized = _round_ste(self.bound(z))
        half_width = jnp.asarray(self._levels // 2, z.dtype)
        return quantized / half_width

    def codes_to_indices(self, zhat):
        half_width = jnp.asarray(self._levels // 2, zhat.dtype)
        shifted = zhat * half_width + half_width
        return jnp.sum(shifted * jnp.asarray(self._basis, zhat.dtype), axis=-1).astype(jnp.int32)

    def indices_to_codes(self, indices):
        "(B, h, w) or (B, N) int indices -> (B, codebook_dim, ...) codes."
        idx = indices[..., None]
        codes_nc = (idx // jnp.asarray(self._basis)) % jnp.asarray(self._levels)
        half_width = self._levels // 2
        codes = (codes_nc - half_width) / half_width
        return jnp.moveaxis(codes.astype(jnp.float32), -1, 1)

    def __call__(self, z):
        """z: (B, C, *spatial) channel-first (image H,W or video T,H,W).

        Returns (indices (B, *spatial), codes (B, C, *spatial), dummy loss).
        """
        is_img = z.ndim >= 4
        if is_img:
            B, C = z.shape[:2]
            spatial = z.shape[2:]
            n = 1
            for s in spatial:
                n *= s
            zf = jnp.moveaxis(z, 1, -1).reshape(B, n, C)
        else:
            zf = z
            B = z.shape[0]
        zf = zf.reshape(zf.shape[0], zf.shape[1], self.num_codebooks, self.codebook_dim)
        codes = self.quantize(zf.astype(jnp.float32))
        indices = self.codes_to_indices(codes)
        out = codes.reshape(codes.shape[0], codes.shape[1], -1)
        if is_img:
            out = jnp.moveaxis(out.reshape((B,) + spatial + (-1,)), -1, 1)
            indices = indices.reshape((B,) + spatial + (self.num_codebooks,))
        if self.num_codebooks == 1:
            indices = indices[..., 0]
        dummy_loss = jnp.zeros((B, 1, 1, 1), out.dtype)
        return indices, out.astype(z.dtype), dummy_loss


class ResidualFSQuantizer(nnx.Module):
    "Residual FSQ (quantizers.py:35-65)."

    def __init__(self, levels: List[int], num_quantizers: int, *, rngs=None, **ignore_kwargs):
        self.layers = nnx.List([FSQuantizer(levels=levels) for _ in range(num_quantizers)])

    def __call__(self, x):
        indices_stack = []
        residual = x
        quantized_out = 0.0
        loss_out = 0.0
        for layer in self.layers:
            quant_indices, z, loss = layer(residual)
            indices_stack.append(quant_indices)
            residual = residual - jax.lax.stop_gradient(z)
            quantized_out = quantized_out + z
            loss_out = loss_out + loss
        indices = jnp.stack(indices_stack, axis=1)
        return indices, quantized_out, loss_out

    def indices_to_codes(self, indices_stack):
        out = 0.0
        for i, layer in enumerate(self.layers):
            out = out + layer.indices_to_codes(indices_stack[:, i])
        return out


class VectorQuantizer(nnx.Module):
    "Taming-transformers VQ (quantizers.py:214-...)."

    def __init__(self, num_embeddings: int, embedding_dim: int, beta: float = 0.25, legacy: bool = True, *, rngs=None, **ignore_kwargs):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.n_e = num_embeddings
        self.e_dim = embedding_dim
        self.beta = beta
        self.legacy = legacy
        self.embedding = nnx.Param(
            jax.random.uniform(rngs.params(), (num_embeddings, embedding_dim), minval=-1.0 / num_embeddings, maxval=1.0 / num_embeddings)
        )

    def __call__(self, z):
        "z: (B, C, H, W). Returns (quantized (B, C, H, W), loss, (.., .., indices))."
        B, C, H, W = z.shape
        zf = jnp.transpose(z, (0, 2, 3, 1)).reshape(-1, self.e_dim)
        emb = self.embedding[...]
        d = (
            jnp.sum(zf**2, axis=1, keepdims=True)
            + jnp.sum(emb**2, axis=1)[None]
            - 2 * zf @ emb.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = emb[idx].reshape(B, H, W, C)
        z_nhwc = jnp.transpose(z, (0, 2, 3, 1))
        if self.legacy:
            loss = jnp.mean((jax.lax.stop_gradient(z_q) - z_nhwc) ** 2) + self.beta * jnp.mean(
                (z_q - jax.lax.stop_gradient(z_nhwc)) ** 2
            )
        else:
            loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z_nhwc) ** 2) + jnp.mean(
                (z_q - jax.lax.stop_gradient(z_nhwc)) ** 2
            )
        z_q = z_nhwc + jax.lax.stop_gradient(z_q - z_nhwc)  # straight-through
        z_q = jnp.transpose(z_q, (0, 3, 1, 2))
        return z_q, loss, (None, None, idx.reshape(B, H, W))

    def get_codebook_entry(self, indices, shape=None):
        z_q = self.embedding[...][indices]
        if shape is not None:
            z_q = jnp.transpose(z_q.reshape(shape), (0, 3, 1, 2))
        return z_q


class LFQuantizer(nnx.Module):
    "Lookup-free quantization (magvit2 style; quantizers.py LFQuantizer)."

    def __init__(self, codebook_size: int, codebook_dim: int, embed_dim: Optional[int] = None, *, rngs=None, **ignore_kwargs):
        assert 2**codebook_dim == codebook_size, "codebook_size must be 2**codebook_dim"
        self.codebook_dim = codebook_dim
        self.codebook_size = codebook_size

    def __call__(self, z):
        "z: (B, C, H, W) with C == codebook_dim. Sign quantization + STE."
        q = jnp.where(z > 0, 1.0, -1.0).astype(z.dtype)
        z_q = z + jax.lax.stop_gradient(q - z)
        bits = (q > 0).astype(jnp.int32)
        weights = (2 ** jnp.arange(self.codebook_dim, dtype=jnp.int32)).reshape(1, -1, 1, 1)
        indices = jnp.sum(bits * weights, axis=1)
        commit_loss = jnp.mean((z - jax.lax.stop_gradient(q)) ** 2)
        return indices, z_q, commit_loss
