"""
Global-quantity regression head (module-path parity with the reference's
uniception/models/prediction_heads/global_head.py; implementation shares
the pose head's trunk in pose_head.py).
"""

from uniception_tpu.models.prediction_heads.pose_head import GlobalHead, ResConvBlock

__all__ = ["GlobalHead", "ResConvBlock"]
