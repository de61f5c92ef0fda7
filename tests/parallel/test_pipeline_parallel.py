"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over
depth-stacked blocks matches the sequential scan exactly, on a multi-stage
CPU mesh (the TPU-native multi-chip test strategy, SURVEY.md §4)."""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from uniception_tpu.nn.blocks import SelfAttentionBlock
from uniception_tpu.nn.scan import make_stacked_blocks, scan_blocks
from uniception_tpu.ops.rope import Rope2D
from uniception_tpu.parallel.pipeline import pipeline_blocks, shard_stacked_state

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("stage",))


def _stacked(depth, dim=32, heads=4, rope=False, seed=0):
    pe = Rope2D(100.0) if rope else None
    return make_stacked_blocks(
        depth,
        lambda r: SelfAttentionBlock(dim=dim, num_heads=heads, custom_positional_encoding=pe, rngs=r),
        nnx.Rngs(seed),
    )


@pytest.mark.parametrize(
    "stages,microbatches",
    [(4, 4), pytest.param(4, 2, marks=pytest.mark.slow), pytest.param(2, 8, marks=pytest.mark.slow)],
)
def test_pipeline_matches_scan(stages, microbatches):
    stacked = _stacked(depth=8)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 16, 32).astype(np.float32))
    ref = scan_blocks(stacked, x)
    mesh = _mesh(stages)
    out = pipeline_blocks(stacked, x, mesh=mesh, num_microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


@pytest.mark.slow
def test_pipeline_with_broadcast_args_rope():
    "Per-microbatch broadcast args (RoPE positions) route to the right stage."
    stacked = _stacked(depth=4, rope=True)
    rng = np.random.RandomState(1)
    B, N, C = 4, 16, 32
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    # DIFFERENT positions per sample so a mis-routed microbatch is caught
    pos = jnp.asarray(rng.randint(0, 7, (B, N, 2)).astype(np.int32))
    ref = scan_blocks(stacked, x, pos)
    out = pipeline_blocks(stacked, x, pos, mesh=_mesh(4), num_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


def test_pipeline_under_jit_with_sharded_params():
    stacked = _stacked(depth=8)
    mesh = _mesh(4)
    shard_stacked_state(stacked, mesh)  # params live sharded along depth
    x = jnp.asarray(np.random.RandomState(2).randn(4, 16, 32).astype(np.float32))
    ref = scan_blocks(stacked, x)

    graphdef, state = nnx.split(stacked)

    @jax.jit
    def f(state, x):
        m = nnx.merge(graphdef, state)
        return pipeline_blocks(m, x, mesh=mesh, num_microbatches=4)

    out = f(state, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


@pytest.mark.slow
def test_pipeline_gradients_match_scan():
    "PP is training-capable: autodiff through the shard_map/ppermute schedule."
    stacked = _stacked(depth=4, dim=32)
    graphdef, params, rest = nnx.split(stacked, nnx.Param, ...)
    x = jnp.asarray(np.random.RandomState(3).randn(4, 8, 32).astype(np.float32))
    mesh = _mesh(4)

    def loss_scan(params, x):
        m = nnx.merge(graphdef, params, rest)
        return (scan_blocks(m, x) ** 2).sum()

    def loss_pp(params, x):
        m = nnx.merge(graphdef, params, rest)
        return (pipeline_blocks(m, x, mesh=mesh, num_microbatches=4) ** 2).sum()

    ref = jax.grad(loss_scan)(params, x)
    out = jax.grad(loss_pp)(params, x)
    flat_ref, _ = jax.tree.flatten(ref)
    flat_out, _ = jax.tree.flatten(out)
    for a, b in zip(flat_ref, flat_out):
        if a.dtype == jnp.float32:
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_pipeline_croco_encoder():
    "Model-path integration: CroCo scan encoder blocks run pipelined."
    from uniception_tpu.models.encoders.base import ViTEncoderInput
    from uniception_tpu.models.encoders.croco import CroCoEncoder

    enc = CroCoEncoder(
        name="pp",
        data_norm_type="dust3r",
        patch_embed_cls="PatchEmbedDust3R",
        img_size=(64, 64),
        enc_embed_dim=96,
        enc_depth=4,
        enc_num_heads=4,
        scan_blocks=True,
        rngs=nnx.Rngs(0),
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(4, 3, 64, 64).astype(np.float32))
    inp = ViTEncoderInput(image=img, data_norm_type="dust3r")
    ref = enc(inp).features

    feats, pos, (h, w) = enc._embed(inp)
    out = pipeline_blocks(enc.enc_blocks, feats, pos, mesh=_mesh(4), num_microbatches=4)
    out = enc._to_bchw(enc.enc_norm(out), h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def _mesh2(stages, data):
    devs = np.asarray(jax.devices()[: stages * data]).reshape(stages, data)
    return Mesh(devs, ("stage", "data"))


@pytest.mark.parametrize(
    "stages,data,microbatches", [(2, 4, 4), pytest.param(4, 2, 4, marks=pytest.mark.slow)]
)
def test_pipeline_dp_composition_matches_scan(stages, data, microbatches):
    """pp x dp on a ("stage", "data") mesh: microbatches batch-sharded over
    the data axis within each stage — the deployable pod layout."""
    stacked = _stacked(depth=8)
    B = microbatches * data  # one sample per (microbatch, data shard)
    x = jnp.asarray(np.random.RandomState(4).randn(B, 16, 32).astype(np.float32))
    ref = scan_blocks(stacked, x)
    mesh = _mesh2(stages, data)
    out = pipeline_blocks(stacked, x, mesh=mesh, data_axis="data", num_microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


@pytest.mark.slow
def test_pipeline_dp_gradients_match_scan():
    "pp x dp is training-capable: grads through the 2-axis shard_map schedule."
    stacked = _stacked(depth=4, dim=32)
    graphdef, params, rest = nnx.split(stacked, nnx.Param, ...)
    mesh = _mesh2(2, 4)
    x = jnp.asarray(np.random.RandomState(5).randn(16, 8, 32).astype(np.float32))
    cot = jnp.asarray(np.random.RandomState(6).randn(16, 8, 32).astype(np.float32))

    def loss_scan(params, x):
        m = nnx.merge(graphdef, params, rest)
        return jnp.vdot(scan_blocks(m, x), cot)

    def loss_pp(params, x):
        m = nnx.merge(graphdef, params, rest)
        return jnp.vdot(pipeline_blocks(m, x, mesh=mesh, data_axis="data", num_microbatches=4), cot)

    ref = jax.grad(loss_scan)(params, x)
    out = jax.grad(loss_pp)(params, x)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        if a.dtype == jnp.float32:
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4)


def test_pipeline_dp_rejects_indivisible_microbatch():
    stacked = _stacked(depth=4)
    mesh = _mesh2(2, 4)
    x = jnp.zeros((4, 16, 32), jnp.float32)  # microbatch of 1 < data=4
    with pytest.raises(AssertionError):
        pipeline_blocks(stacked, x, mesh=mesh, data_axis="data", num_microbatches=4)


def _mesh3(stages, data, model):
    devs = np.asarray(jax.devices()[: stages * data * model]).reshape(stages, data, model)
    return Mesh(devs, ("stage", "data", "model"))


def test_pipeline_3d_pp_dp_tp_matches_scan():
    """Full 3D pod layout on a ("stage","data","model") mesh: GPipe manual
    over stage+data, TP as an auto/GSPMD axis inside each stage."""
    stacked = _stacked(depth=8)
    mesh = _mesh3(2, 2, 2)
    ref = None
    x = jnp.asarray(np.random.RandomState(7).randn(8, 16, 32).astype(np.float32))
    ref = scan_blocks(stacked, x)

    shard_stacked_state(stacked, mesh, model_axis="model")
    # the TP specs really landed: qkv kernels are (depth, in, 3*dim) sharded P(stage, None, model)
    from jax.sharding import PartitionSpec as P
    qkv = nnx.state(stacked)["attn"]["qkv"]["kernel"].value
    assert qkv.sharding.spec == P("stage", None, "model"), qkv.sharding.spec

    out = pipeline_blocks(
        stacked, x, mesh=mesh, data_axis="data", model_axis="model", num_microbatches=4
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_pipeline_pp_tp_gradients_match_scan():
    "pp x tp (no dp) is training-capable through the partial-manual shard_map."
    stacked = _stacked(depth=4, dim=32)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("stage", "model"))
    shard_stacked_state(stacked, mesh, model_axis="model")
    graphdef, params, rest = nnx.split(stacked, nnx.Param, ...)
    x = jnp.asarray(np.random.RandomState(8).randn(4, 8, 32).astype(np.float32))
    cot = jnp.asarray(np.random.RandomState(9).randn(4, 8, 32).astype(np.float32))

    def loss_scan(params, x):
        m = nnx.merge(graphdef, params, rest)
        return jnp.vdot(scan_blocks(m, x), cot)

    def loss_pp(params, x):
        m = nnx.merge(graphdef, params, rest)
        return jnp.vdot(pipeline_blocks(m, x, mesh=mesh, model_axis="model", num_microbatches=4), cot)

    ref = jax.grad(loss_scan)(params, x)
    out = jax.grad(loss_pp)(params, x)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        if a.dtype == jnp.float32:
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4)
