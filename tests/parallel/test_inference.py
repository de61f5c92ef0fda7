"""
Sharded inference on the 8-way CPU mesh: dp and dp+tp outputs must match
the unsharded single-device forward.
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.parallel.inference import make_infer_fn

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

SMALL = dict(
    img_size=(32, 32), enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
    info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
)


@pytest.mark.parametrize("model_axis,use_tp", [(1, False), (2, True)])
def test_sharded_inference_matches_unsharded(model_axis, use_tp):
    model = DUSt3R(name="infer_test", rngs=nnx.Rngs(0), **SMALL)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))

    ref1, ref2 = model.forward_pair(img1, img2)

    ctx, state = make_infer_fn(model, data=8 // model_axis, model_axis=model_axis, use_tp=use_tp)
    with ctx.mesh:
        s1, s2 = ctx.shard((img1, img2))
        out1, out2 = ctx.infer(state, s1, s2)

    np.testing.assert_allclose(np.asarray(out1["pts3d"]), np.asarray(ref1["pts3d"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2["conf"]), np.asarray(ref2["conf"]), rtol=1e-4, atol=1e-4)
