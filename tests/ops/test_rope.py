"""
RoPE2D parity vs the reference's pure-torch fallback implementation
(uniception/models/libs/croco/pos_embed.py:109-155), which is itself
numerically identical to the CUDA kernel.
"""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, has_reference

import jax.numpy as jnp  # noqa: E402

from uniception_tpu.ops.rope import Rope2D, rope_2d  # noqa: E402


def make_inputs(B=2, H=4, D=32, gh=7, gw=9, seed=0):
    rng = np.random.RandomState(seed)
    N = gh * gw
    tok = rng.randn(B, N, H, D).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    pos = np.stack([ys.ravel(), xs.ravel()], -1)[None].repeat(B, 0).astype(np.int64)
    return tok, pos


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_rope2d_matches_torch_fallback():
    add_reference_to_path()
    import torch
    from uniception.models.libs.croco.pos_embed import RoPE2D as TorchRoPE2D

    assert TorchRoPE2D.__module__.endswith("pos_embed"), "expected the torch fallback, not the CUDA ext"

    tok, pos = make_inputs()
    t_rope = TorchRoPE2D(freq=100.0)
    # torch layout is (B, H, N, D)
    t_out = t_rope(torch.from_numpy(tok).permute(0, 2, 1, 3), torch.from_numpy(pos))
    t_out = t_out.permute(0, 2, 1, 3).numpy()

    j_out = np.asarray(rope_2d(jnp.asarray(tok), jnp.asarray(pos)))
    assert np.abs(t_out - j_out).max() < 5e-5


def test_rope2d_inverse_is_negative_f0():
    tok, pos = make_inputs()
    fwd = rope_2d(jnp.asarray(tok), jnp.asarray(pos), f0=1.0)
    back = rope_2d(fwd, jnp.asarray(pos), f0=-1.0)
    assert np.abs(np.asarray(back) - tok).max() < 1e-5


def test_rope2d_module_api():
    tok, pos = make_inputs()
    rope = Rope2D(freq=100.0)
    out = rope(jnp.asarray(tok), jnp.asarray(pos))
    assert out.shape == tok.shape
    # rotation preserves norms per (y|x, u/v) pair
    assert abs(float(jnp.linalg.norm(out) - jnp.linalg.norm(tok))) < 1e-2
