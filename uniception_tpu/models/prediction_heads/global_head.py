"""
Global-quantity regression head (module-path parity with the reference's
uniception/models/prediction_heads/global_head.py; implementation shares
the pose head's trunk in pose_head.py).
"""

from uniception_tpu.models.prediction_heads.pose_head import GlobalHead, ResConvBlock

__all__ = ["GlobalHead", "ResConvBlock"]


if __name__ == "__main__":
    # smoke asserts (reference global_head.py:124-142)
    import numpy as np
    from flax import nnx

    import jax.numpy as jnp

    from uniception_tpu.models.prediction_heads.base import PredictionHeadInput
    from uniception_tpu.models.prediction_heads.pose_head import GlobalHead

    head = GlobalHead(patch_size=16, input_feature_dim=32, output_representation_dim=1, rngs=nnx.Rngs(0))
    feat = jnp.asarray(np.random.RandomState(0).randn(2, 32, 7, 7).astype(np.float32))
    out = head(PredictionHeadInput(last_feature=feat))
    assert out.decoded_channels.shape == (2, 1), out.decoded_channels.shape
    print("global head smoke: OK")
