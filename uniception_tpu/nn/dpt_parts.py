"""
DPT internals: scratch projection convs, residual conv units, feature
fusion blocks, nonlinearity factory.

Behavioral parity with reference uniception/models/libs/croco/dpt_block.py:
    * make_scratch (:21-81)
    * ResidualConvUnit_custom (:114-178)
    * FeatureFusionBlock_custom (:180-256), align_corners=True 2x upsample
    * custom activations sine/gaussian/xcosx + make_nonlinearity (:83-274)

TPU-native notes: all convs run in NHWC (the DPT heads convert from BCHW
once at entry); the 2x bilinear upsample uses the exact torch
align_corners=True weights (ops/resize.py).
"""

from typing import Callable, Optional

import jax.numpy as jnp
from flax import nnx

from uniception_tpu.nn.common import Identity
from uniception_tpu.ops.resize import interpolate

__all__ = [
    "make_scratch_convs",
    "ResidualConvUnit",
    "FeatureFusionBlock",
    "make_nonlinearity",
    "Conv2dTorch",
    "ConvTranspose2dTorch",
    "Seq",
]


def Conv2dTorch(cin, cout, kernel_size, stride=1, padding=0, bias=True, *, dtype=None, param_dtype=jnp.float32, rngs):
    "nnx.Conv over NHWC with torch Conv2d padding semantics."
    k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    s = (stride, stride) if isinstance(stride, int) else stride
    p = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    return nnx.Conv(
        cin, cout, kernel_size=k, strides=s, padding=p, use_bias=bias, dtype=dtype, param_dtype=param_dtype, rngs=rngs
    )


def ConvTranspose2dTorch(cin, cout, kernel_size, stride, *, dtype=None, param_dtype=jnp.float32, rngs):
    "nnx.ConvTranspose over NHWC matching torch ConvTranspose2d (padding=0)."
    k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    s = (stride, stride) if isinstance(stride, int) else stride
    return nnx.ConvTranspose(
        cin, cout, kernel_size=k, strides=s, padding="VALID", dtype=dtype, param_dtype=param_dtype, rngs=rngs
    )


class Seq(nnx.Module):
    """Sequential whose children live at integer-string attributes, so state
    paths match torch nn.Sequential keys exactly ("input_process.0.0.weight")."""

    def __init__(self, *layers):
        self._n = len(layers)
        for i, layer in enumerate(layers):
            setattr(self, str(i), layer)

    def __call__(self, x):
        for i in range(self._n):
            x = getattr(self, str(i))(x)
        return x

    def __getitem__(self, i):
        return getattr(self, str(i))


def make_nonlinearity(nonlinearity: str, dim=None, on_channels=False) -> Callable:
    "Activation factory (dpt_block.py:258-274)."
    import jax

    if nonlinearity == "relu":
        return jax.nn.relu
    if nonlinearity == "sine":
        return jnp.sin
    if nonlinearity == "gaussian":
        return lambda x: jnp.exp(-(x**2))
    if nonlinearity == "tanh":
        return jnp.tanh
    if nonlinearity == "sigmoid":
        return jax.nn.sigmoid
    if nonlinearity == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if nonlinearity == "xcosx":
        return lambda x: x * jnp.cos(x)
    raise ValueError(f"Unknown nonlinearity: {nonlinearity}")


class ResidualConvUnit(nnx.Module):
    "act-conv(-bn)-act-conv(-bn) + skip (dpt_block.py:114-178)."

    def __init__(self, features: int, activation: Callable, bn: bool, *, dtype=None, param_dtype=jnp.float32, rngs):
        self.bn = bn
        self.conv1 = Conv2dTorch(features, features, 3, 1, 1, bias=not bn, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv2 = Conv2dTorch(features, features, 3, 1, 1, bias=not bn, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        if bn:
            self.bn1 = nnx.BatchNorm(features, use_running_average=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            self.bn2 = nnx.BatchNorm(features, use_running_average=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.activation = activation

    def __call__(self, x):
        out = self.activation(x)
        out = self.conv1(out)
        if self.bn:
            out = self.bn1(out)
        out = self.activation(out)
        out = self.conv2(out)
        if self.bn:
            out = self.bn2(out)
        return out + x


class FeatureFusionBlock(nnx.Module):
    """Fusion + 2x upsample (dpt_block.py:180-256), width_ratio=1 path.

    ``has_res1=False`` mirrors the reference deleting refinenet4's unused
    resConfUnit1 (prediction_heads/dpt.py:82-83).
    """

    def __init__(
        self,
        features: int,
        activation: Callable,
        bn: bool = False,
        align_corners: bool = True,
        has_res1: bool = True,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs,
    ):
        self.align_corners = align_corners
        self.out_conv = Conv2dTorch(features, features, 1, 1, 0, bias=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        if has_res1:
            self.resConfUnit1 = ResidualConvUnit(features, activation, bn, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.resConfUnit2 = ResidualConvUnit(features, activation, bn, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x, res: Optional[jnp.ndarray] = None):
        "x, res: NHWC. Returns NHWC at 2x spatial resolution."
        output = x
        if res is not None:
            output = output + self.resConfUnit1(res)
        output = self.resConfUnit2(output)
        # 2x bilinear upsample over (H, W); interpolate works on the last two
        # dims, so round-trip through BCHW (XLA fuses the transposes).
        output = jnp.transpose(output, (0, 3, 1, 2))
        output = interpolate(output, scale_factor=2, mode="bilinear", align_corners=self.align_corners)
        output = jnp.transpose(output, (0, 2, 3, 1))
        return self.out_conv(output)


def make_fusion_block(features, use_bn, width_ratio=1, nonlinearity="relu", has_res1=True, *, dtype=None, param_dtype=jnp.float32, rngs):
    assert width_ratio == 1, "width_ratio != 1 not supported (unused in reference models)"
    act = make_nonlinearity(nonlinearity, features, on_channels=True)
    return FeatureFusionBlock(
        features, act, bn=use_bn, align_corners=True, has_res1=has_res1, dtype=dtype, param_dtype=param_dtype, rngs=rngs
    )


def make_scratch_convs(in_shape, out_shape, *, dtype=None, param_dtype=jnp.float32, rngs):
    "Per-level 3x3 projection convs (dpt_block.py:21-81, expand=False)."
    return nnx.List(
        [Conv2dTorch(cin, out_shape, 3, 1, 1, bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs) for cin in in_shape]
    )
