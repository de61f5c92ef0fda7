"""
Patch-position helpers.

TPU-native analogue of the reference PositionGetter
(uniception/models/utils/positional_encoding.py:8-23). Under ``jit`` the
(y, x) integer grid is a trace-time constant, so no caching is needed —
XLA constant-folds it.
"""

import jax.numpy as jnp

__all__ = ["PositionGetter", "make_patch_positions"]


def make_patch_positions(batch_size: int, height: int, width: int, dtype=jnp.int32) -> jnp.ndarray:
    """Return (batch, height*width, 2) integer (y, x) positions of patches.

    Row-major (y outer, x inner), matching torch.cartesian_prod(y, x) in the
    reference.
    """
    y = jnp.arange(height, dtype=dtype)
    x = jnp.arange(width, dtype=dtype)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    pos = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # (H*W, 2)
    return jnp.broadcast_to(pos[None], (batch_size, height * width, 2))


class PositionGetter:
    "Callable wrapper matching the reference's PositionGetter API."

    def __call__(self, b: int, h: int, w: int, device=None) -> jnp.ndarray:
        return make_patch_positions(b, h, w)
