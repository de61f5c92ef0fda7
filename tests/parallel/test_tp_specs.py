"""TP sharding rules must PRODUCE sharded layouts, not just preserve
numerics (replication is numerically equivalent, so the dp x tp
equivalence tests cannot catch a silently-replicating rule table —
which is exactly what happened when flax started flattening
VariableState leaves with a trailing '.value' path key)."""

import numpy as np
import pytest
from flax import nnx

import jax
from jax.sharding import PartitionSpec as P

from uniception_tpu.nn.blocks import SelfAttentionBlock
from uniception_tpu.nn.scan import make_stacked_blocks
from uniception_tpu.parallel.mesh import make_mesh, tp_shard_state

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _spec(leaf):
    return leaf[...].sharding.spec


def test_tp_rules_actually_shard_loop_layout():
    mesh = make_mesh(data=4, model=2)
    blk = SelfAttentionBlock(dim=32, num_heads=4, qkv_bias=True, rngs=nnx.Rngs(0))
    st = tp_shard_state(nnx.state(blk, nnx.Param), mesh)
    assert _spec(st["attn"]["qkv"]["kernel"]) == P(None, "model")  # column-parallel
    assert _spec(st["attn"]["qkv"]["bias"]) == P("model")
    assert _spec(st["attn"]["proj"]["kernel"]) == P("model", None)  # row-parallel
    assert _spec(st["mlp"]["fc1"]["kernel"]) == P(None, "model")
    assert _spec(st["mlp"]["fc2"]["kernel"]) == P("model", None)
    # norm params replicate (divisibility fallback)
    assert _spec(st["norm1"]["scale"]) == P()


def test_tp_rules_shard_scan_layout_feature_axes():
    "Depth-stacked kernels shard the same FEATURE axis (depth axis replicated)."
    mesh = make_mesh(data=4, model=2)
    stacked = make_stacked_blocks(
        2, lambda r: SelfAttentionBlock(dim=32, num_heads=4, qkv_bias=True, rngs=r), nnx.Rngs(0)
    )
    st = tp_shard_state(nnx.state(stacked, nnx.Param), mesh)
    assert _spec(st["attn"]["qkv"]["kernel"]) == P(None, None, "model")
    assert _spec(st["attn"]["proj"]["kernel"]) == P(None, "model", None)
    assert _spec(st["mlp"]["fc2"]["kernel"]) == P(None, "model", None)


def test_tp_sharded_forward_matches_replicated():
    mesh = make_mesh(data=4, model=2)
    blk = SelfAttentionBlock(dim=64, num_heads=4, qkv_bias=True, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(blk)
    x = np.random.RandomState(0).randn(4, 16, 64).astype(np.float32)

    import jax.numpy as jnp

    ref = blk(jnp.asarray(x))
    with mesh:
        st = tp_shard_state(state, mesh)

        @jax.jit
        def f(st, x):
            return nnx.merge(graphdef, st)(x)

        out = f(st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_tp_rules_shard_int8_scan_layout():
    "Stacked Int8Linear w_q/w_scale shard their feature axis (depth replicated)."
    from uniception_tpu.nn.quant import quantize_linears

    mesh = make_mesh(data=4, model=2)
    stacked = make_stacked_blocks(
        2, lambda r: SelfAttentionBlock(dim=32, num_heads=4, qkv_bias=True, rngs=r), nnx.Rngs(0)
    )
    n = quantize_linears(stacked, min_params=1)
    assert n > 0
    st = tp_shard_state(nnx.state(stacked, nnx.Param), mesh)
    # (depth, in, out) int8 kernels: depth axis None, feature axis sharded
    assert _spec(st["attn"]["qkv"]["w_q"]) == P(None, None, "model")
    assert _spec(st["attn"]["qkv"]["w_scale"]) == P(None, None, "model")  # (depth, 1, out)
    assert _spec(st["attn"]["proj"]["w_q"]) == P(None, "model", None)  # row-parallel
    assert _spec(st["mlp"]["fc1"]["w_q"]) == P(None, None, "model")
    assert _spec(st["mlp"]["fc2"]["w_q"]) == P(None, "model", None)
