"""
Multi-device tests on the 8-way virtual CPU mesh (the TPU-native answer to
multi-chip testing without a pod — SURVEY.md §4).

Checks: DP-sharded forward matches single-device output; TP sharding rules
produce valid shardings and identical results; the dp+tp training step
compiles and runs.
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch, tp_shard_state

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

SMALL = dict(
    img_size=(32, 32), enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
    info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
)


def make_model():
    return DUSt3R(name="dust3r_shard_test", rngs=nnx.Rngs(0), **SMALL)


@pytest.fixture(scope="module")
def model_and_inputs():
    model = make_model()
    graphdef, state = nnx.split(model)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))

    def fwd(state, img1, img2):
        m = nnx.merge(graphdef, state)
        r1, r2 = m.forward_pair(img1, img2)
        return r1["pts3d"], r2["pts3d_in_other_view"]

    ref = jax.jit(fwd)(state, img1, img2)
    return fwd, state, img1, img2, ref


def test_dp_sharded_matches_single_device(model_and_inputs):
    fwd, state, img1, img2, ref = model_and_inputs
    mesh = make_mesh(data=8, model=1)
    with mesh:
        state_r = replicate_state(state, mesh)
        img1_s, img2_s = shard_batch((img1, img2), mesh)
        out = jax.jit(fwd)(state_r, img1_s, img2_s)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_tp_sharded_matches_single_device(model_and_inputs):
    fwd, state, img1, img2, ref = model_and_inputs
    mesh = make_mesh(data=2, model=4)
    with mesh:
        state_tp = tp_shard_state(state, mesh)
        img1_s, img2_s = shard_batch((img1, img2), mesh)
        out = jax.jit(fwd)(state_tp, img1_s, img2_s)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_multichip_train_step_runs():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
