"""
Pose regression head (Reloc3r / MaRePo style).

Parity with reference uniception/models/prediction_heads/pose_head.py:18-158:
1x1-conv ResConvBlocks -> global average pool -> MLPs -> separate fc_t (3)
and fc_rot (rot-representation dim) outputs, concatenated.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.prediction_heads.base import PredictionHeadInput, SummaryTaskOutput
from uniception_tpu.nn.common import Identity, LinearX
from uniception_tpu.nn.dpt_parts import Conv2dTorch, Seq
from uniception_tpu.utils.checkpoint import load_checkpoint
from uniception_tpu.utils.torch_compat import load_torch_state_dict

__all__ = ["PoseHead", "GlobalHead", "ResConvBlock"]


class ResConvBlock(nnx.Module):
    "1x1-conv residual block (pose_head.py:18-47). NHWC."

    def __init__(self, in_channels: int, out_channels: int, *, dtype=None, param_dtype=jnp.float32, rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.head_skip = Identity() if in_channels == out_channels else Conv2dTorch(in_channels, out_channels, 1, 1, 0, **kw)
        self.res_conv1 = Conv2dTorch(in_channels, out_channels, 1, 1, 0, **kw)
        self.res_conv2 = Conv2dTorch(out_channels, out_channels, 1, 1, 0, **kw)
        self.res_conv3 = Conv2dTorch(out_channels, out_channels, 1, 1, 0, **kw)

    def __call__(self, res):
        x = jax.nn.relu(self.res_conv1(res))
        x = jax.nn.relu(self.res_conv2(x))
        x = jax.nn.relu(self.res_conv3(x))
        return self.head_skip(res) + x


class _SummaryTrunk(nnx.Module):
    "Shared proj -> resconv -> avgpool -> MLP trunk of the pose/global heads."

    def __init__(self, patch_size, input_feature_dim, num_resconv_block, *, dtype=None, param_dtype=jnp.float32, rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.patch_size = patch_size
        self.input_feature_dim = input_feature_dim
        self.num_resconv_block = num_resconv_block
        self.output_dim = 4 * patch_size**2

        self.proj = Conv2dTorch(input_feature_dim, self.output_dim, 1, 1, 0, **kw)
        self.res_conv = nnx.List([ResConvBlock(self.output_dim, self.output_dim, **kw) for _ in range(num_resconv_block)])
        self.more_mlps = Seq(
            LinearX(self.output_dim, self.output_dim, **kw),
            jax.nn.relu,
            LinearX(self.output_dim, self.output_dim, **kw),
            jax.nn.relu,
        )

    def _trunk(self, feat_bchw):
        assert feat_bchw.shape[1] == self.input_feature_dim, (
            f"Input feature dimension {feat_bchw.shape[1]} does not match expected {self.input_feature_dim}"
        )
        x = jnp.transpose(feat_bchw, (0, 2, 3, 1))  # NHWC
        x = self.proj(x)
        for blk in self.res_conv:
            x = blk(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1, flattened (B, PC)
        return self.more_mlps(x)


class PoseHead(_SummaryTrunk):
    "Pose regression head: trunk -> fc_t (3) + fc_rot (quat dim)."

    def __init__(
        self,
        patch_size: int,
        input_feature_dim: int,
        num_resconv_block: int = 2,
        rot_representation_dim: int = 4,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        super().__init__(patch_size, input_feature_dim, num_resconv_block, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.rot_representation_dim = rot_representation_dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.fc_t = LinearX(self.output_dim, 3, **kw)
        self.fc_rot = LinearX(self.output_dim, rot_representation_dim, **kw)

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained pose head from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])

    def __call__(self, feature_input: PredictionHeadInput) -> SummaryTaskOutput:
        feat = self._trunk(feature_input.last_feature)
        return SummaryTaskOutput(decoded_channels=jnp.concatenate([self.fc_t(feat), self.fc_rot(feat)], axis=1))


class GlobalHead(_SummaryTrunk):
    "Global-quantity regression head (global_head.py:16-121): trunk -> fc_output."

    def __init__(
        self,
        patch_size: int,
        input_feature_dim: int,
        num_resconv_block: int = 2,
        output_representation_dim: int = 1,
        pretrained_checkpoint_path: Optional[str] = None,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        super().__init__(patch_size, input_feature_dim, num_resconv_block, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.output_representation_dim = output_representation_dim
        self.fc_output = LinearX(self.output_dim, output_representation_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        if pretrained_checkpoint_path is not None:
            print(f"Loading pretrained global head from {pretrained_checkpoint_path}")
            ckpt = load_checkpoint(pretrained_checkpoint_path)
            load_torch_state_dict(self, ckpt["model"])

    def __call__(self, feature_input: PredictionHeadInput) -> SummaryTaskOutput:
        feat = self._trunk(feature_input.last_feature)
        return SummaryTaskOutput(decoded_channels=self.fc_output(feat))


if __name__ == "__main__":
    # smoke asserts (reference pose_head.py:160-181)
    import numpy as np

    head = PoseHead(patch_size=16, input_feature_dim=32, rngs=nnx.Rngs(0))
    feat = jnp.asarray(np.random.RandomState(0).randn(2, 32, 7, 7).astype(np.float32))
    out = head(PredictionHeadInput(last_feature=feat))
    assert out.decoded_channels.shape == (2, 7), out.decoded_channels.shape  # 3 trans + 4 quat
    print("pose head smoke: OK")
