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


def _honor_jax_platforms_env() -> None:
    """Re-assert the ``JAX_PLATFORMS`` env var over the live jax config.

    This environment's TPU plugin registers itself via a sitecustomize at
    EVERY interpreter start and force-updates ``jax_platforms`` — so a
    subprocess launched with ``JAX_PLATFORMS=cpu`` (tests, CPU tooling,
    the virtual-mesh dryrun) still initializes the TPU backend, which
    blocks indefinitely when the tunnel is down. JAX's documented
    contract is that the env var picks the platform; restore it here,
    before any backend initialization. No-op when the env var is unset
    or already in effect.
    """
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except Exception:
        pass  # backends already initialized or knob renamed: leave as-is


_honor_jax_platforms_env()
