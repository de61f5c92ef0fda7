"""
DPT prediction head: 4-hook feature pyramid -> fusion/refinenet stages ->
8x-upsampled features -> regression/segmentation processors.

Behavioral parity with reference uniception/models/prediction_heads/dpt.py:
    * DPTFeature (:32-232): per-hook resize convs (4x deconv / 2x deconv /
      identity / stride-2 conv) -> scratch layer_rn 3x3 projections ->
      4 fusion stages with align_corners=True 2x upsampling.
    * DPTRegressionProcessor (:238-311): conv -> exact-size bilinear
      interp (align_corners=True) -> conv-act-conv.
    * DPTSegmentationProcessor (:314-379).
    * DPTFeatureDoubleUpsampling (:383-560): the 2-hook variant.

State-dict paths match torch exactly (input_process.{i}.{j}, scratch.*,
refinenet*.resConfUnit*). All convs run NHWC internally (TPU-native); the
dataclass API keeps the reference's BCHW.
"""

from typing import Iterable, List, Optional, Tuple, Union

import jax.numpy as jnp
from flax import nnx, struct

from uniception_tpu.models.prediction_heads.base import PixelTaskOutput, PredictionHeadLayeredInput
from uniception_tpu.nn.common import Identity
from uniception_tpu.nn.dpt_parts import (
    Conv2dTorch,
    ConvTranspose2dTorch,
    Seq,
    make_fusion_block,
    make_nonlinearity,
)
from uniception_tpu.ops.resize import interpolate
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["DPTFeature", "DPTFeatureInput", "DPTRegressionProcessor", "DPTSegmentationProcessor", "DPTFeatureDoubleUpsampling", "DPT_CHECKPOINT_ALIASES"]

# The reference DPT registers the same scratch convs under three spellings
# (input_process.{i}.1, scratch.layer{i}_rn, scratch.layer_rn.{i-1} — see
# reference libs/croco/dpt_block.py:71 and prediction_heads/dpt.py); we
# consume input_process.* and drop the aliases on load.
DPT_CHECKPOINT_ALIASES = (r"scratch\.layer[1-4]_rn\.", r"scratch\.layer_rn\.")


class DPTFeatureInput(struct.PyTreeNode):
    features_upsampled_8x: jnp.ndarray  # BCHW
    target_output_shape: Tuple[int, int] = struct.field(pytree_node=False)


def _pair(t):
    return t if isinstance(t, tuple) else (t, t)


def _to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _to_bchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


class _Scratch(nnx.Module):
    "Container matching the reference's scratch module paths."


class DPTFeature(nnx.Module):
    "DPT 4-hook fusion head producing 8x-upsampled features."

    def __init__(
        self,
        patch_size: Union[int, Tuple[int, int]] = 16,
        main_tasks: Iterable[str] = ("rgb",),
        hooks: List[int] = [2, 5, 8, 11],
        input_feature_dims: Optional[Union[int, List[int]]] = 768,
        layer_dims: List[int] = [96, 192, 384, 768],
        feature_dim: int = 256,
        use_bn: bool = False,
        output_width_ratio=1,
        pretrained_checkpoint_path: Optional[str] = None,
        checkpoint_gradient: bool = False,
        nonlinearity: str = "relu",
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.patch_size = _pair(patch_size)
        self.main_tasks = tuple(main_tasks)
        self.hooks = hooks
        self.layer_dims = layer_dims
        self.feature_dim = feature_dim
        self.checkpoint_gradient = checkpoint_gradient

        if isinstance(input_feature_dims, int):
            input_feature_dims = 4 * [input_feature_dims]
        assert len(input_feature_dims) == 4
        self.input_feature_dims = [d * len(self.main_tasks) for d in input_feature_dims]

        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        self.scratch = _Scratch()
        scratch_convs = [
            Conv2dTorch(layer_dims[i], feature_dim, 3, 1, 1, bias=False, **kw) for i in range(4)
        ]
        self.scratch.layer1_rn, self.scratch.layer2_rn, self.scratch.layer3_rn, self.scratch.layer4_rn = scratch_convs
        self.scratch.refinenet1 = make_fusion_block(feature_dim, use_bn, output_width_ratio, nonlinearity, **kw)
        self.scratch.refinenet2 = make_fusion_block(feature_dim, use_bn, output_width_ratio, nonlinearity, **kw)
        self.scratch.refinenet3 = make_fusion_block(feature_dim, use_bn, output_width_ratio, nonlinearity, **kw)
        # refinenet4's resConfUnit1 is unused and deleted in the reference (dpt.py:82-83)
        self.scratch.refinenet4 = make_fusion_block(feature_dim, use_bn, output_width_ratio, nonlinearity, has_res1=False, **kw)

        d = self.input_feature_dims
        act_1 = Seq(
            Conv2dTorch(d[0], layer_dims[0], 1, 1, 0, **kw),
            ConvTranspose2dTorch(layer_dims[0], layer_dims[0], 4, 4, **kw),
        )
        act_2 = Seq(
            Conv2dTorch(d[1], layer_dims[1], 1, 1, 0, **kw),
            ConvTranspose2dTorch(layer_dims[1], layer_dims[1], 2, 2, **kw),
        )
        act_3 = Seq(Conv2dTorch(d[2], layer_dims[2], 1, 1, 0, **kw))
        act_4 = Seq(
            Conv2dTorch(d[3], layer_dims[3], 1, 1, 0, **kw),
            Conv2dTorch(layer_dims[3], layer_dims[3], 3, 2, 1, **kw),
        )
        self.input_process = nnx.List(
            [Seq(act, conv) for act, conv in zip([act_1, act_2, act_3, act_4], scratch_convs)]
        )

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained DPT dense feature head from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], strict=False, ignore=DPT_CHECKPOINT_ALIASES)

    def __call__(self, dpt_input: PredictionHeadLayeredInput) -> DPTFeatureInput:
        layered_feats = dpt_input.list_features
        for hook_idx, hook in enumerate(self.hooks):
            assert layered_feats[hook].shape[1] == self.input_feature_dims[hook_idx], (
                f"Input feature dimension mismatch at hook {hook}. Expected BCHW"
            )

        layers = [_to_nhwc(layered_feats[hook]) for hook in self.hooks]
        layers = [self.input_process[idx](layer) for idx, layer in enumerate(layers)]

        # fuse coarse-to-fine; crop refinenet4's 2x output to layer3's size
        # (reference dpt.py:203-228 wraps the fusion stages in
        # torch.utils.checkpoint when checkpoint_gradient is set)
        if self.checkpoint_gradient:
            from uniception_tpu.nn.common import remat_call

            path_4 = remat_call(self.scratch.refinenet4, layers[3])[:, : layers[2].shape[1], : layers[2].shape[2], :]
            path_3 = remat_call(self.scratch.refinenet3, path_4, layers[2])
            path_2 = remat_call(self.scratch.refinenet2, path_3, layers[1])
            feature_upsampled_8x = remat_call(self.scratch.refinenet1, path_2, layers[0])
        else:
            path_4 = self.scratch.refinenet4(layers[3])[:, : layers[2].shape[1], : layers[2].shape[2], :]
            path_3 = self.scratch.refinenet3(path_4, layers[2])
            path_2 = self.scratch.refinenet2(path_3, layers[1])
            feature_upsampled_8x = self.scratch.refinenet1(path_2, layers[0])

        return DPTFeatureInput(
            features_upsampled_8x=_to_bchw(feature_upsampled_8x),
            target_output_shape=dpt_input.target_output_shape,
        )


class DPTRegressionProcessor(nnx.Module):
    "conv -> exact-size bilinear (align_corners=True) -> conv-act-conv (dpt.py:238-311)."

    def __init__(
        self,
        input_feature_dim: int,
        output_dim: int,
        hidden_dims: Optional[List[int]] = None,
        pretrained_checkpoint_path: Optional[str] = None,
        checkpoint_gradient: bool = False,
        nonlinearity: str = "relu",
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        if hidden_dims is None:
            hidden_dims = [input_feature_dim // 2] * 2
        assert len(hidden_dims) == 2
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        self.checkpoint_gradient = checkpoint_gradient
        self.conv1 = Conv2dTorch(input_feature_dim, hidden_dims[0], 3, 1, 1, **kw)
        self.conv2 = Seq(
            Conv2dTorch(hidden_dims[0], hidden_dims[1], 3, 1, 1, **kw),
            make_nonlinearity(nonlinearity),
            Conv2dTorch(hidden_dims[1], output_dim, 1, 1, 0, **kw),
        )

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained DPT regression processor from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], strict=False, ignore=DPT_CHECKPOINT_ALIASES)

    def _body(self, x_bchw, output_shape):
        x = _to_nhwc(x_bchw)
        x = self.conv1(x)
        x = _to_bchw(x)
        x = interpolate(x, size=output_shape, mode="bilinear", align_corners=True)
        x = _to_nhwc(x)
        return self.conv2(x)

    def __call__(self, dpt_processor_input: DPTFeatureInput) -> PixelTaskOutput:
        output_shape = dpt_processor_input.target_output_shape

        # the reference wraps this processor in torch.utils.checkpoint too
        # (dpt.py:269-311); its full-target-resolution conv activations are
        # the largest f32 buffers of the dpt training step
        if self.checkpoint_gradient:
            import jax

            from uniception_tpu.nn.common import resolve_remat_policy

            graphdef, state = nnx.split(self)

            def fn(state, x):
                return nnx.merge(graphdef, state)._body(x, output_shape)

            x = jax.checkpoint(fn, policy=resolve_remat_policy())(
                state, dpt_processor_input.features_upsampled_8x
            )
        else:
            x = self._body(dpt_processor_input.features_upsampled_8x, output_shape)
        return PixelTaskOutput(decoded_channels=_to_bchw(x))


class DPTSegmentationProcessor(nnx.Module):
    "conv-act-conv -> exact-size bilinear (dpt.py:314-379)."

    def __init__(
        self,
        input_feature_dim: int,
        output_dim: int,
        hidden_dim: Optional[int] = None,
        use_bn: bool = False,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        if hidden_dim is None:
            hidden_dim = input_feature_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        import jax

        # index placeholders keep torch Sequential numbering: the reference's
        # conv stack is [conv, bn|Identity, ReLU, Dropout, conv] (dpt.py:344-350)
        self.conv = Seq(
            Conv2dTorch(input_feature_dim, hidden_dim, 3, 1, 1, bias=False, **kw),
            nnx.BatchNorm(hidden_dim, use_running_average=True, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            if use_bn
            else Identity(),
            jax.nn.relu,
            Identity(),  # Dropout (eval mode)
            Conv2dTorch(hidden_dim, output_dim, 1, 1, 0, **kw),
        )

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained DPT segmentation processor from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], strict=False, ignore=DPT_CHECKPOINT_ALIASES)

    def __call__(self, dpt_processor_input: DPTFeatureInput) -> PixelTaskOutput:
        x = _to_nhwc(dpt_processor_input.features_upsampled_8x)
        x = self.conv(x)
        x = _to_bchw(x)
        x = interpolate(x, size=dpt_processor_input.target_output_shape, mode="bilinear", align_corners=True)
        return PixelTaskOutput(decoded_channels=x)


class DPTFeatureDoubleUpsampling(nnx.Module):
    "2-hook DPT variant (dpt.py:383-560)."

    def __init__(
        self,
        patch_size: Union[int, Tuple[int, int]] = 16,
        main_tasks: Iterable[str] = ("rgb",),
        hooks: List[int] = [0, 1],
        input_feature_dims: Optional[Union[int, List[int]]] = 768,
        layer_dims: List[int] = [384, 768],
        feature_dim: int = 256,
        use_bn: bool = False,
        output_width_ratio=1,
        pretrained_checkpoint_path: Optional[str] = None,
        checkpoint_gradient: bool = False,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        self.patch_size = _pair(patch_size)
        self.main_tasks = tuple(main_tasks)
        self.hooks = hooks
        self.layer_dims = layer_dims
        self.feature_dim = feature_dim
        self.checkpoint_gradient = checkpoint_gradient

        if isinstance(input_feature_dims, int):
            input_feature_dims = 2 * [input_feature_dims]
        assert len(input_feature_dims) == 2
        self.input_feature_dims = [d * len(self.main_tasks) for d in input_feature_dims]

        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        self.scratch = _Scratch()
        self.scratch.layer3_rn = Conv2dTorch(layer_dims[0], feature_dim, 3, 1, 1, bias=False, **kw)
        self.scratch.layer4_rn = Conv2dTorch(layer_dims[1], feature_dim, 3, 1, 1, bias=False, **kw)
        self.scratch.refinenet3 = make_fusion_block(feature_dim, use_bn, output_width_ratio, **kw)
        self.scratch.refinenet4 = make_fusion_block(feature_dim, use_bn, output_width_ratio, has_res1=False, **kw)

        d = self.input_feature_dims
        act_3 = Seq(Conv2dTorch(d[0], layer_dims[0], 1, 1, 0, **kw))
        act_4 = Seq(
            Conv2dTorch(d[1], layer_dims[1], 1, 1, 0, **kw),
            Conv2dTorch(layer_dims[1], layer_dims[1], 3, 2, 1, **kw),
        )
        self.input_process = nnx.List(
            [Seq(act_3, self.scratch.layer3_rn), Seq(act_4, self.scratch.layer4_rn)]
        )

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained DPT dense feature head from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"], strict=False, ignore=DPT_CHECKPOINT_ALIASES)

    def __call__(self, dpt_input: PredictionHeadLayeredInput) -> DPTFeatureInput:
        layered_feats = dpt_input.list_features
        for hook_idx, hook in enumerate(self.hooks):
            assert layered_feats[hook].shape[1] == self.input_feature_dims[hook_idx]

        layers = [_to_nhwc(layered_feats[hook]) for hook in self.hooks]
        layers = [self.input_process[idx](layer) for idx, layer in enumerate(layers)]

        path_4 = self.scratch.refinenet4(layers[1])[:, : layers[0].shape[1], : layers[0].shape[2], :]
        feature_upsampled_2x = self.scratch.refinenet3(path_4, layers[0])

        return DPTFeatureInput(
            features_upsampled_8x=_to_bchw(feature_upsampled_2x),
            target_output_shape=dpt_input.target_output_shape,
        )


if __name__ == "__main__":
    # smoke asserts (reference dpt.py:576-676 style, shape checks only — the
    # fwd/bwd benchmark equivalent is scripts/bench_train.py)
    import numpy as np
    from flax import nnx

    from uniception_tpu.models.prediction_heads.base import PredictionHeadLayeredInput

    head = DPTFeature(patch_size=16, hooks=[0, 1, 2, 3], input_feature_dims=[32, 32, 32, 32], layer_dims=[16, 24, 32, 48],
                      feature_dim=24, rngs=nnx.Rngs(0))
    feats = [jnp.asarray(np.random.RandomState(i).randn(1, 32, 4, 4).astype(np.float32)) for i in range(4)]
    out = head(PredictionHeadLayeredInput(list_features=feats, target_output_shape=None))
    # 4x4 patch grid -> 8x upsampled feature map at feature_dim channels
    assert out.features_upsampled_8x.shape == (1, 24, 32, 32), out.features_upsampled_8x.shape
    print("dpt feature smoke: OK", out.features_upsampled_8x.shape)
