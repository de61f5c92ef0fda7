"""
MoGe-v1 multi-level conv decoder head.

Behavioral parity with reference
uniception/models/prediction_heads/moge_conv.py:17-248: per-level 1x1
projections summed, three 2x deconv+residual upsample stages with UV-plane
concatenation (aspect-ratio awareness), exact-size bilinear resize, and
per-output conv blocks. Replicate ("edge") padding matches torch's
padding_mode="replicate".
"""

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from uniception_tpu.models.prediction_heads.base import PixelTaskOutput, PredictionHeadLayeredInput
from uniception_tpu.nn.common import Identity
from uniception_tpu.nn.dpt_parts import Conv2dTorch, ConvTranspose2dTorch, Seq
from uniception_tpu.ops.resize import interpolate
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["MoGeConvFeature", "ResidualConvBlock", "normalized_view_plane_uv"]


class ReplicatePadConv(nnx.Conv):
    """kxk conv with torch padding_mode='replicate' (edge padding). NHWC.

    Subclasses nnx.Conv directly so the state path has no extra segment —
    torch keys like upsample_blocks.0.0.1.weight map 1:1.
    """

    def __init__(self, cin, cout, kernel_size, padding, *, dtype=None, param_dtype=jnp.float32, rngs):
        super().__init__(
            cin, cout, kernel_size=(kernel_size, kernel_size), strides=(1, 1), padding="VALID",
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )
        self.replicate_padding = padding

    def __call__(self, x):
        p = self.replicate_padding
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
        return super().__call__(x)


def _activation(name):
    if name == "relu":
        return jax.nn.relu
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if name == "silu":
        return jax.nn.silu
    if name == "elu":
        return jax.nn.elu
    raise ValueError(f"Unsupported activation function: {name}")


class ResidualConvBlock(nnx.Module):
    "GroupNorm-act-conv x2 + skip (moge_conv.py:17-64). NHWC."

    def __init__(
        self,
        in_channels: int,
        out_channels: Optional[int] = None,
        hidden_channels: Optional[int] = None,
        padding_mode: str = "replicate",
        activation: str = "relu",
        norm: str = "group_norm",
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs,
    ):
        out_channels = out_channels or in_channels
        hidden_channels = hidden_channels or in_channels
        act = _activation(activation)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        n_groups2 = hidden_channels // 32 if norm == "group_norm" else 1

        self.layers = Seq(
            nnx.GroupNorm(in_channels, num_groups=1, dtype=dtype, param_dtype=param_dtype, rngs=rngs),
            act,
            ReplicatePadConv(in_channels, hidden_channels, 3, 1, **kw),
            nnx.GroupNorm(hidden_channels, num_groups=n_groups2, dtype=dtype, param_dtype=param_dtype, rngs=rngs),
            act,
            ReplicatePadConv(hidden_channels, out_channels, 3, 1, **kw),
        )
        self.skip_connection = (
            Conv2dTorch(in_channels, out_channels, 1, 1, 0, **kw) if in_channels != out_channels else Identity()
        )

    def __call__(self, x):
        return self.layers(x) + self.skip_connection(x)


def normalized_view_plane_uv(width: int, height: int, aspect_ratio: Optional[float] = None, dtype=jnp.float32):
    "UV plane spanning the unit-diagonal view plane (moge_conv.py:67-87). (H, W, 2)."
    if aspect_ratio is None:
        aspect_ratio = width / height
    span_x = aspect_ratio / (1 + aspect_ratio**2) ** 0.5
    span_y = 1 / (1 + aspect_ratio**2) ** 0.5
    u = np.linspace(-span_x * (width - 1) / width, span_x * (width - 1) / width, width)
    v = np.linspace(-span_y * (height - 1) / height, span_y * (height - 1) / height, height)
    uu, vv = np.meshgrid(u, v, indexing="xy")
    return jnp.asarray(np.stack([uu, vv], axis=-1), dtype)


class MoGeConvFeature(nnx.Module):
    "MoGe conv decoder (moge_conv.py:90-248)."

    def __init__(
        self,
        patch_size: int,
        num_features: int,
        input_feature_dims: Union[int, List[int]],
        dim_out: List[int],
        dim_proj: int = 512,
        dim_upsample: List[int] = [256, 128, 64],
        dim_times_res_block_hidden: int = 2,
        num_res_blocks: int = 2,
        res_block_norm: str = "group_norm",
        last_res_blocks: int = 0,
        last_conv_channels: int = 32,
        last_conv_size: int = 1,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.patch_size = patch_size
        if isinstance(input_feature_dims, int):
            input_feature_dims = [input_feature_dims] * num_features
        self.input_feature_dims = input_feature_dims
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        self.projects = nnx.List(
            [Conv2dTorch(input_feature_dims[i], dim_proj, 1, 1, 0, **kw) for i in range(num_features)]
        )

        def make_upsampler(cin, cout):
            deconv = ConvTranspose2dTorch(cin, cout, 2, 2, **kw)
            # the reference replicates the [0, 0] kernel entry across the 2x2
            # spatial window at init (moge_conv.py:169-174)
            deconv.kernel[...] = jnp.broadcast_to(deconv.kernel[0:1, 0:1], deconv.kernel.shape)
            return Seq(deconv, ReplicatePadConv(cout, cout, 3, 1, **kw))

        self.upsample_blocks = nnx.List(
            [
                Seq(
                    make_upsampler(cin + 2, cout),
                    *(
                        ResidualConvBlock(
                            cout, cout, dim_times_res_block_hidden * cout, activation="relu", norm=res_block_norm, **kw
                        )
                        for _ in range(num_res_blocks)
                    ),
                )
                for cin, cout in zip([dim_proj] + dim_upsample[:-1], dim_upsample)
            ]
        )

        def make_output_block(dim_in, dim_out_):
            return Seq(
                ReplicatePadConv(dim_in, last_conv_channels, 3, 1, **kw),
                *(
                    ResidualConvBlock(
                        last_conv_channels,
                        last_conv_channels,
                        dim_times_res_block_hidden * last_conv_channels,
                        activation="relu",
                        norm=res_block_norm,
                        **kw,
                    )
                    for _ in range(last_res_blocks)
                ),
                jax.nn.relu,
                ReplicatePadConv(last_conv_channels, dim_out_, last_conv_size, last_conv_size // 2, **kw),
            )

        self.output_block = nnx.List([make_output_block(dim_upsample[-1] + 2, d) for d in dim_out])

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained MoGe conv feature head from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])

    def _cat_uv(self, x, img_aspect):
        B, H, W, _ = x.shape
        uv = normalized_view_plane_uv(W, H, aspect_ratio=img_aspect, dtype=x.dtype)  # (H, W, 2)
        uv = jnp.broadcast_to(uv[None], (B, H, W, 2))
        return jnp.concatenate([x, uv], axis=-1)

    def __call__(self, head_input: PredictionHeadLayeredInput) -> PixelTaskOutput:
        img_h, img_w = head_input.target_output_shape
        aspect = img_w / img_h

        # project each level and sum (NHWC)
        x = None
        for proj, feat in zip(self.projects, head_input.list_features):
            y = proj(jnp.transpose(feat, (0, 2, 3, 1)))
            x = y if x is None else x + y

        for block in self.upsample_blocks:
            x = self._cat_uv(x, aspect)
            x = block(x)

        x = jnp.transpose(x, (0, 3, 1, 2))
        x = interpolate(x, size=(img_h, img_w), mode="bilinear", align_corners=False)
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = self._cat_uv(x, aspect)

        outputs = [jnp.transpose(block(x), (0, 3, 1, 2)) for block in self.output_block]
        return PixelTaskOutput(decoded_channels=jnp.concatenate(outputs, axis=1))
