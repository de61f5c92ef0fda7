"""
UniCeption-TPU: a TPU-native (JAX / XLA / Pallas / pjit) library of composable
building blocks for 3D/4D/spatial perception models.

The library factors DUSt3R/MASt3R-style models into:

    images -> Encoder (ViT backbone)
           -> Info-Sharing transformer (multi-view attention)
           -> Prediction Head (DPT / Linear / Pose / ...)
           -> Adaptor (pointmap, depth, flow, confidence, mask, ...)

mirroring the capability surface of the reference PyTorch library
(castacks/UniCeption, see /root/reference) while being designed TPU-first:
bf16 trunks on the MXU, Pallas kernels for 2D RoPE and flash attention,
`jax.sharding.Mesh` + pjit for data/model parallel execution, and
`lax.scan`-friendly static-shape forward passes.
"""

__version__ = "0.1.0"
