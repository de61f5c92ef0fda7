"""
Small shared NN utilities: Identity, exact GELU, initializers.

Initializer parity notes (vs torch):
    * torch xavier_uniform on a (out, in) weight == jax xavier_uniform on the
      (in, out) kernel (the bound depends only on fan_in + fan_out).
    * torch trunc_normal_(std=0.02, a=-2, b=2) is effectively an untruncated
      normal at +-100 sigma; jax truncated_normal truncates at +-2 sigma.
      The difference is immaterial (weights are loaded from checkpoints for
      parity-critical paths).
"""

import functools

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["Identity", "gelu_exact", "xavier_uniform", "trunc_normal", "LinearX", "remat_call"]


class Identity(nnx.Module):
    "A no-op module (torch nn.Identity analogue)."

    def __call__(self, x, *args, **kwargs):
        return x


def gelu_exact(x):
    """GELU matching torch nn.GELU's default (erf) — unless the global
    config selects the tanh approximation for production speed
    (UNICEPTION_TPU_GELU=tanh: ~7x cheaper on the TPU VPU, ~1e-3 relative
    activation difference, inside the reference's 1e-2 parity gates)."""
    from uniception_tpu.models.utils.config import get_gelu_mode

    return jax.nn.gelu(x, approximate=get_gelu_mode() == "tanh")


_xavier_uniform = jax.nn.initializers.xavier_uniform()


def xavier_uniform(key, shape, dtype=jnp.float32):
    """Xavier-uniform init — or zeros under fast init (models/utils/config
    ``fast_init``: the checkpoint-loading cold-start path, where eager PRNG
    init is ~65% of scan-layout construction time and is overwritten
    immediately anyway)."""
    from uniception_tpu.models.utils.config import get_fast_init

    if get_fast_init():
        return jnp.zeros(shape, dtype)
    return _xavier_uniform(key, shape, dtype)


def trunc_normal(std: float = 0.02):
    base = jax.nn.initializers.truncated_normal(stddev=std)

    def init(key, shape, dtype=jnp.float32):
        from uniception_tpu.models.utils.config import get_fast_init

        if get_fast_init():
            return jnp.zeros(shape, dtype)
        return base(key, shape, dtype)

    return init


def LinearX(
    in_features: int,
    out_features: int,
    *,
    use_bias: bool = True,
    dtype=None,
    param_dtype=jnp.float32,
    rngs: nnx.Rngs,
) -> nnx.Linear:
    """nnx.Linear with the reference's init scheme: xavier-uniform kernel,
    zero bias (reference: encoders/croco.py:136-145 et al.)."""
    return nnx.Linear(
        in_features,
        out_features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=param_dtype,
        kernel_init=xavier_uniform,
        bias_init=jax.nn.initializers.zeros,
        rngs=rngs,
    )


def resolve_remat_policy():
    """The UNICEPTION_TPU_REMAT_POLICY env default for gradient
    checkpointing ("dots" | "attn_out" | unset = full remat) — shared by
    remat_call and the DPT processor's inline checkpoint."""
    import os

    env_policy = os.environ.get("UNICEPTION_TPU_REMAT_POLICY")
    if env_policy == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if env_policy == "attn_out":
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    if env_policy:
        import warnings

        warnings.warn(
            f"UNICEPTION_TPU_REMAT_POLICY={env_policy!r} is not one of"
            " ('dots', 'attn_out'); falling back to full rematerialization.",
            stacklevel=2,
        )
    return None


def remat_call(blk: nnx.Module, *args, policy=None):
    """Apply a module under jax.checkpoint (gradient checkpointing).

    TPU-native equivalent of the reference's class-swap gradient-checkpoint
    wrapper (encoders/base.py:139-152): activations inside the block are
    rematerialized in the backward pass instead of stored, trading FLOPs
    for HBM. The module is split to a pure (graphdef, state) function so
    checkpointing never mutates nnx state (RngCount) across trace levels.

    policy: optional jax.checkpoint_policies.* for selective remat (e.g.
    dots_with_no_batch_dims_saveable keeps matmul outputs and only
    recomputes the cheap elementwise tail — usually the best HBM/FLOPs
    trade on TPU). Env default UNICEPTION_TPU_REMAT_POLICY:
        "dots"     -> dots_with_no_batch_dims_saveable
        "attn_out" -> save_only_these_names("attn_out"): keep just the
                      attention outputs (the expensive-to-recompute kernel
                      results, named in nn/blocks.py) and recompute the
                      projections/norms/MLP — ~1 of ~14 per-block
                      activation tensors saved.
    """
    if policy is None:
        policy = resolve_remat_policy()
    graphdef, state = nnx.split(blk)

    def fn(state, *inner):
        return nnx.merge(graphdef, state)(*inner)

    return jax.checkpoint(fn, policy=policy)(state, *args)
