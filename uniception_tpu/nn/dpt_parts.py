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

import jax
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
    "Interpolate2x",
    "DPTOutputAdapter",
]

# DPTOutputAdapter consumes scratch.layer{i}_rn and act_{i}_postprocess;
# the reference torch module additionally aliases the same tensors under
# scratch.layer_rn.{i-1} and act_postprocess.{i-1} (dpt_block.py:71,488).
DPT_ADAPTER_CHECKPOINT_ALIASES = (r"scratch\.layer_rn\.", r"(^|\.)act_postprocess\.")


class _Conv2dDPT(nnx.Conv):
    """nnx.Conv with an opt-in Pallas lowering for the 3x3/s1/p1 case.

    Perf notes (measured on v5e, BASELINE.md — do not retry the losers):
      * re-lowering as 9 separate *einsum* GEMMs is 2-3x SLOWER (each
        einsum re-reads the input from HBM; XLA's conv reuses taps in VMEM);
      * the Pallas kernel (ops/conv3x3.py — one VMEM tile, nine MXU
        matmuls) beats XLA only for bf16 activations at <=256² spatial
        (fusion@128²: 175 vs 125 TF/s; conv1@256²: +13%) and loses for
        f32 (XLA's conv already computes f32 at bf16 rate via
        allow_excess_precision) and at 512² (sublane-shift overhead), so
        dispatch applies exactly those measured bounds.
    """

    def __call__(self, x):
        from uniception_tpu.models.utils.config import get_conv3x3_impl

        k = self.kernel[...]
        if (
            get_conv3x3_impl() == "pallas"
            and x.dtype == jnp.bfloat16
            and self.dtype == jnp.bfloat16  # only modules explicitly built bf16 (head_dtype
            # region) — a dtype=None conv must keep its f32 promote-compute semantics
            and k.shape[:2] == (3, 3)
            and tuple(self.strides) == (1, 1)
            and tuple(self.padding) == ((1, 1), (1, 1))
            and self.feature_group_count == 1
            and x.ndim == 4
            and x.shape[1] * x.shape[2] <= 256 * 256
            and x.shape[3] % 128 == 0
            and k.shape[3] % 128 == 0
            and jax.devices()[0].platform == "tpu"
        ):
            from uniception_tpu.ops.conv3x3 import conv3x3_nhwc

            b = self.bias[...] if self.bias is not None else None
            return conv3x3_nhwc(x, k.astype(jnp.bfloat16), b, block_h=8)
        return super().__call__(x)


def Conv2dTorch(cin, cout, kernel_size, stride=1, padding=0, bias=True, *, dtype=None, param_dtype=jnp.float32, rngs):
    "nnx.Conv over NHWC with torch Conv2d padding semantics (see _Conv2dDPT for the Pallas option)."
    k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    s = (stride, stride) if isinstance(stride, int) else stride
    p = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    return _Conv2dDPT(
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


class Interpolate2x(nnx.Module):
    "Parameter-free 2x bilinear upsample layer over NHWC (dpt_block.py Interpolate)."

    def __init__(self, scale_factor=2, mode="bilinear", align_corners=True):
        self.scale_factor = scale_factor
        self.mode = mode
        self.align_corners = align_corners

    def __call__(self, x):
        x = jnp.transpose(x, (0, 3, 1, 2))
        x = interpolate(x, scale_factor=self.scale_factor, mode=self.mode, align_corners=self.align_corners)
        return jnp.transpose(x, (0, 2, 3, 1))


class _Container(nnx.Module):
    pass


class DPTOutputAdapter(nnx.Module):
    """MultiMAE-style DPT output adapter (dpt_block.py:326-530).

    Takes a list of per-depth encoder token tensors, hooks 4 of them,
    projects each through its act_postprocess resize (4x deconv / 2x
    deconv / identity / stride-2 conv), fuses through 4 refinenet stages
    and applies a regression or semantic-segmentation output head.

    I/O: encoder_tokens are (B, N, C); the output is NCHW to match the
    reference contract. State paths mirror torch keys
    (scratch.layer{i}_rn, scratch.refinenet{i}, act_{i}_postprocess.{j},
    head.{j}); the torch duplicates under scratch.layer_rn.* /
    act_postprocess.* alias the same tensors and are ignored on load.
    """

    def __init__(
        self,
        num_channels: int = 1,
        stride_level: int = 1,
        patch_size=16,
        main_tasks=("rgb",),
        hooks=(2, 5, 8, 11),
        layer_dims=(96, 192, 384, 768),
        feature_dim: int = 256,
        last_dim: int = 32,
        use_bn: bool = False,
        dim_tokens_enc: Optional[int] = None,
        head_type: str = "regression",
        output_width_ratio=1,
        nonlinearity: str = "relu",
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs=None,
        **_ignore,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_channels = num_channels
        self.stride_level = stride_level
        self.patch_size = (patch_size, patch_size) if isinstance(patch_size, int) else tuple(patch_size)
        self.main_tasks = tuple(main_tasks)
        self.hooks = list(hooks)
        self.layer_dims = list(layer_dims)
        self.feature_dim = feature_dim
        self.head_type = head_type
        self.dim_tokens_enc = None

        self.P_H = max(1, self.patch_size[0] // stride_level)
        self.P_W = max(1, self.patch_size[1] // stride_level)

        self.scratch = _Container()
        convs = make_scratch_convs(self.layer_dims, feature_dim, **kw)
        self.scratch.layer1_rn, self.scratch.layer2_rn, self.scratch.layer3_rn, self.scratch.layer4_rn = convs
        self.scratch.refinenet1 = make_fusion_block(feature_dim, use_bn, output_width_ratio, nonlinearity, **kw)
        self.scratch.refinenet2 = make_fusion_block(feature_dim, use_bn, output_width_ratio, nonlinearity, **kw)
        self.scratch.refinenet3 = make_fusion_block(feature_dim, use_bn, output_width_ratio, nonlinearity, **kw)
        self.scratch.refinenet4 = make_fusion_block(feature_dim, use_bn, output_width_ratio, nonlinearity, **kw)

        if head_type == "regression":
            self.head = Seq(
                Conv2dTorch(feature_dim, feature_dim // 2, 3, 1, 1, **kw),
                Interpolate2x(2, "bilinear", True),
                Conv2dTorch(feature_dim // 2, last_dim, 3, 1, 1, **kw),
                make_nonlinearity(nonlinearity, dim=last_dim),
                Conv2dTorch(last_dim, num_channels, 1, 1, 0, **kw),
            )
        elif head_type == "semseg":
            self.head = Seq(
                Conv2dTorch(feature_dim, feature_dim, 3, 1, 1, bias=False, **kw),
                nnx.BatchNorm(feature_dim, use_running_average=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
                if use_bn
                else Identity(),
                make_nonlinearity(nonlinearity, dim=feature_dim),
                Identity(),  # torch Dropout(0.1) placeholder (inference no-op)
                Conv2dTorch(feature_dim, num_channels, 1, 1, 0, **kw),
                Interpolate2x(2, "bilinear", True),
            )
        else:
            raise ValueError('DPT head_type must be "regression" or "semseg".')

        if dim_tokens_enc is not None:
            self.init(dim_tokens_enc=dim_tokens_enc, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def init(self, dim_tokens_enc=768, *, dtype=None, param_dtype=jnp.float32, rngs=None):
        "Build the encoder-dim-dependent act_postprocess resizers (dpt_block.py:408-490)."
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        if isinstance(dim_tokens_enc, int):
            dim_tokens_enc = 4 * [dim_tokens_enc]
        self.dim_tokens_enc = [dt * len(self.main_tasks) for dt in dim_tokens_enc]
        ld = self.layer_dims

        self.act_1_postprocess = Seq(
            Conv2dTorch(self.dim_tokens_enc[0], ld[0], 1, 1, 0, **kw),
            ConvTranspose2dTorch(ld[0], ld[0], 4, 4, **kw),
        )
        self.act_2_postprocess = Seq(
            Conv2dTorch(self.dim_tokens_enc[1], ld[1], 1, 1, 0, **kw),
            ConvTranspose2dTorch(ld[1], ld[1], 2, 2, **kw),
        )
        self.act_3_postprocess = Seq(
            Conv2dTorch(self.dim_tokens_enc[2], ld[2], 1, 1, 0, **kw),
        )
        self.act_4_postprocess = Seq(
            Conv2dTorch(self.dim_tokens_enc[3], ld[3], 1, 1, 0, **kw),
            Conv2dTorch(ld[3], ld[3], 3, 2, 1, **kw),
        )

    def __call__(self, encoder_tokens, image_size):
        "encoder_tokens: list of (B, N, C); image_size: (H, W). Returns NCHW."
        assert self.dim_tokens_enc is not None, "Need to call init(dim_tokens_enc) first"
        H, W = image_size
        N_H = H // (self.stride_level * self.P_H)
        N_W = W // (self.stride_level * self.P_W)

        layers = [encoder_tokens[hook] for hook in self.hooks]
        # (B, N_H*N_W, C) -> NHWC (convs here run channels-last)
        layers = [t.reshape(t.shape[0], N_H, N_W, t.shape[-1]) for t in layers]
        posts = [self.act_1_postprocess, self.act_2_postprocess, self.act_3_postprocess, self.act_4_postprocess]
        layers = [post(t) for post, t in zip(posts, layers)]
        rn = [self.scratch.layer1_rn, self.scratch.layer2_rn, self.scratch.layer3_rn, self.scratch.layer4_rn]
        layers = [conv(t) for conv, t in zip(rn, layers)]

        path_4 = self.scratch.refinenet4(layers[3])
        path_3 = self.scratch.refinenet3(path_4, layers[2])
        path_2 = self.scratch.refinenet2(path_3, layers[1])
        path_1 = self.scratch.refinenet1(path_2, layers[0])

        out = self.head(path_1)
        return jnp.transpose(out, (0, 3, 1, 2))
