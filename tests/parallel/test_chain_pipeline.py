"""
Heterogeneous-stage chain pipeline (parallel/chain.py): stages with
DIFFERENT programs/params/shapes placed on different devices must produce
exactly what the single-device forward produces — only the placement
schedule may differ. (parallel/pipeline.py covers the homogeneous
depth-stacked GPipe case; this covers the encoder -> info-sharing ->
heads model chain, reference factory/dust3r.py:250-332.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.parallel.chain import ChainPipeline, dust3r_chain_results, dust3r_chain_stages

SMALL = dict(
    img_size=(32, 32),
    enc_embed_dim=64,
    enc_depth=2,
    enc_num_heads=4,
    info_sharing_dim=64,
    info_sharing_depth=2,
    info_sharing_num_heads=4,
)


def test_generic_chain_matches_sequential():
    "Three unlike stages (different shapes/arity) == running them in order."

    class Lin(nnx.Module):
        def __init__(self, din, dout, rngs):
            self.w = nnx.Param(jax.random.normal(rngs.params(), (din, dout)) * 0.1)

    r = nnx.Rngs(0)
    a, b, c = Lin(8, 16, r), Lin(16, 4, r), Lin(4, 4, r)
    ga, gb, gc = (nnx.split(m)[0] for m in (a, b, c))

    # stage 1 fans out to TWO boundary arrays; stage 2 consumes both
    def f_a(state, x):
        return x @ nnx.merge(ga, state).w.value

    def f_b(state, x):
        y = x @ nnx.merge(gb, state).w.value
        return y, jnp.sum(y, axis=-1, keepdims=True)

    def f_c(state, y, ysum):
        return y @ nnx.merge(gc, state).w.value + ysum

    x = jax.random.normal(jax.random.key(1), (4, 8))
    ref = f_c(nnx.split(c)[1], *f_b(nnx.split(b)[1], f_a(nnx.split(a)[1], x)))

    devices = jax.devices()
    assert len(devices) >= 3, "conftest provides 8 virtual devices"
    pipe = ChainPipeline([(f_a, a), (f_b, b), (f_c, c)], devices=devices[:3])
    out = pipe(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # the result lives on the LAST stage's device
    assert out.devices() == {devices[2]}

    # streaming keeps input order
    xs = [jax.random.normal(jax.random.key(i), (4, 8)) for i in range(5)]
    outs = pipe.run(xs)
    for xi, oi in zip(xs, outs):
        refi = f_c(nnx.split(c)[1], *f_b(nnx.split(b)[1], f_a(nnx.split(a)[1], xi)))
        np.testing.assert_array_equal(np.asarray(oi), np.asarray(refi))


@pytest.mark.parametrize("head", ["linear", pytest.param("dpt", marks=pytest.mark.slow)])
def test_dust3r_chain_matches_forward_pair(head):
    "3-stage DUSt3R chain == forward_pair (tight tol: jit-boundary fusion), params per-device."
    cfg = dict(SMALL)
    if head == "dpt":
        # the factory hardcodes IFR hooks [5, 8] (reference semantics)
        cfg["info_sharing_depth"] = 9
    model = DUSt3R(name="chain_test", pred_head_type=head, rngs=nnx.Rngs(0), **cfg)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))

    ref1, ref2 = model.forward_pair(img1, img2)

    devices = jax.devices()[:3]
    stages = dust3r_chain_stages(model)
    assert len(stages) == 3
    pipe = ChainPipeline(stages, devices=devices)
    res1, res2 = dust3r_chain_results(pipe((img1, img2)))

    # not bit-exact vs the EAGER forward_pair: the jitted stages fuse
    # differently; ~3e-5 f32 noise, far inside the repo's 5e-5 parity bar
    tol = dict(rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res1["pts3d"]), np.asarray(ref1["pts3d"]), **tol)
    np.testing.assert_allclose(np.asarray(res1["conf"]), np.asarray(ref1["conf"]), **tol)
    np.testing.assert_allclose(
        np.asarray(res2["pts3d_in_other_view"]), np.asarray(ref2["pts3d_in_other_view"]), **tol
    )
    np.testing.assert_allclose(np.asarray(res2["conf"]), np.asarray(ref2["conf"]), **tol)

    # each stage's parameters live on (only) that stage's device — the
    # memory property that lets a larger-than-one-chip model serve as a chain
    for state, dev in zip(pipe._states, devices):
        for leaf in jax.tree.leaves(state):
            if hasattr(leaf, "devices"):
                assert leaf.devices() == {dev}


def test_dust3r_chain_streams_microbatches():
    "run() over several microbatches matches per-batch forward_pair."
    model = DUSt3R(name="chain_stream", rngs=nnx.Rngs(0), **SMALL)
    pipe = ChainPipeline(dust3r_chain_stages(model), devices=jax.devices()[:3])

    rng = np.random.RandomState(1)
    batches = [
        (
            jnp.asarray(rng.randn(1, 3, 32, 32).astype(np.float32)),
            jnp.asarray(rng.randn(1, 3, 32, 32).astype(np.float32)),
        )
        for _ in range(4)
    ]
    outs = pipe.run(batches)
    for (i1, i2), o in zip(batches, outs):
        ref1, _ = model.forward_pair(i1, i2)
        res1, _ = dust3r_chain_results(o)
        np.testing.assert_allclose(np.asarray(res1["pts3d"]), np.asarray(ref1["pts3d"]), rtol=1e-3, atol=1e-4)
