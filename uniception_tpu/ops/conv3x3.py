"""
Pallas 3x3 stride-1 convolution for the DPT head's hot shapes.

Why: XLA's conv lowering runs the DPT regressor/fusion convs at ~80 TF/s
on v5e *independent of dtype* (schedule-bound — measured in BASELINE.md;
re-lowering as 9 separate einsum GEMMs is 2-3x slower because every einsum
re-reads the input from HBM). This kernel gets the matmul rate AND the
tap reuse: each input tile is DMA'd to VMEM once and all nine taps read it
from there, as nine MXU matmuls accumulating in fp32.

Layout: NHWC, stride 1, padding 1 (the DPT case: scratch layer_rn convs,
ResidualConvUnit pairs, regressor conv1/conv2 — reference
uniception/models/libs/croco/dpt_block.py:114-178, prediction_heads/dpt.py:238-311).

Mechanism: the input is padded and re-tiled host-side into overlapping
(th+2)-row windows (one extra HBM copy, ~0.1 ms at DPT sizes), so a plain
BlockSpec grid feeds tiles through Mosaic's automatic double-buffering; the
kernel unrolls the 3x3 taps as nine (th*W, C) @ (C, Co) matmuls.

Selection: `Conv2dTorch` routes eligible convs here on TPU when
``UNICEPTION_TPU_CONV3X3=pallas`` (measured default set in
models/utils/config.py); anything else falls back to XLA's conv.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["conv3x3_nhwc"]


def _kernel(x_ref, w_ref, b_ref, o_ref, *, th, W, C, Co, out_dtype):
    x_t = x_ref[0]  # (th+2, W+2, C)
    acc = jnp.zeros((th * W, Co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            a = x_t[dy : dy + th, dx : dx + W, :].reshape(th * W, C)
            acc = acc + jnp.dot(a, w_ref[dy, dx], preferred_element_type=jnp.float32)
    acc = acc + b_ref[0]
    o_ref[0] = acc.reshape(th, W, Co).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def conv3x3_nhwc(x, w, b=None, *, block_h: int = 16, interpret: bool = False):
    """3x3 / stride-1 / pad-1 convolution over NHWC via Pallas.

    x: (B, H, W, C); w: (3, 3, C, Co) (flax HWIO); b: (Co,) or None.
    Returns (B, H, W, Co) in x.dtype. Accumulation is fp32 (same numerics
    as XLA's conv with preferred fp32 accumulation). Differentiable: the
    backward pass runs through the XLA conv (custom_vjp below) — the
    Pallas kernel is forward/serving-only, gradients are exact.
    """
    if b is None:
        return _conv3x3_vjp_nobias(x, w, block_h, interpret)
    return _conv3x3_vjp(x, w, b, block_h, interpret)


def _conv3x3_pallas_impl(x, w, b, block_h, interpret):
    B, H, W, C = x.shape
    Co = w.shape[-1]
    th = min(block_h, H)
    nt = -(-H // th)  # ceil
    Hp = nt * th

    # pad: +1 halo each side in H/W, plus bottom padding to a whole tile
    xp = jnp.pad(x, ((0, 0), (1, 1 + (Hp - H)), (1, 1), (0, 0)))
    # overlapping (th+2)-row windows, materialized host-side: (B*nt, th+2, W+2, C)
    tiles = jnp.stack([xp[:, i * th : i * th + th + 2] for i in range(nt)], axis=1)
    tiles = tiles.reshape(B * nt, th + 2, W + 2, C)

    bias = jnp.zeros((1, Co), jnp.float32) if b is None else b.reshape(1, Co).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, W=W, C=C, Co=Co, out_dtype=x.dtype),
        grid=(B * nt,),
        in_specs=[
            pl.BlockSpec((1, th + 2, W + 2, C), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((3, 3, C, Co), lambda g: (0, 0, 0, 0)),
            pl.BlockSpec((1, Co), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, Co), lambda g: (g, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * nt, th, W, Co), x.dtype),
        interpret=interpret,
    )(tiles, w.astype(x.dtype), bias)

    out = out.reshape(B, Hp, W, Co)
    return out[:, :H] if Hp != H else out


# custom VJPs: Pallas forward, exact XLA-conv backward (the kernel itself
# is serving-oriented; training through it must not crash — mirrors the
# flash-attention fallback pattern in ops/flash_attention.py)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3_vjp(x, w, b, block_h, interpret):
    return _conv3x3_pallas_impl(x, w, b, block_h, interpret)


def _conv3x3_vjp_fwd(x, w, b, block_h, interpret):
    return _conv3x3_pallas_impl(x, w, b, block_h, interpret), (x, w, b)


def _conv3x3_vjp_bwd(block_h, interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(conv3x3_reference, x, w, b)
    return vjp(g)


_conv3x3_vjp.defvjp(_conv3x3_vjp_fwd, _conv3x3_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv3x3_vjp_nobias(x, w, block_h, interpret):
    return _conv3x3_pallas_impl(x, w, None, block_h, interpret)


def _conv3x3_vjp_nobias_fwd(x, w, block_h, interpret):
    return _conv3x3_pallas_impl(x, w, None, block_h, interpret), (x, w)


def _conv3x3_vjp_nobias_bwd(block_h, interpret, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x, w: conv3x3_reference(x, w, None), x, w)
    return vjp(g)


_conv3x3_vjp_nobias.defvjp(_conv3x3_vjp_nobias_fwd, _conv3x3_vjp_nobias_bwd)


def conv3x3_reference(x, w, b=None):
    "XLA conv reference (same contraction) for parity tests."
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.reshape(1, 1, 1, -1)
    return y.astype(x.dtype)
