"""
Cold-start construction path: abstract (eval_shape) construct + host-side
checkpoint load + single-transfer materialize must produce bit-identical
outputs to the eager construct + per-leaf load path.
"""

import numpy as np
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.utils.coldstart import abstract_construct, materialize
from uniception_tpu.utils.torch_compat import load_torch_state_dict, state_dict_from_module

CFG = dict(
    name="dust3r_small",
    img_size=(64, 64),
    enc_embed_dim=96,
    enc_depth=3,
    enc_num_heads=4,
    info_sharing_dim=64,
    info_sharing_num_heads=4,
    info_sharing_depth=2,
)


def _outputs(model):
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    img2 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    r1, _ = model.forward_pair(img1, img2)
    return np.asarray(r1["pts3d"])


def test_cold_path_matches_eager():
    eager = DUSt3R(rngs=nnx.Rngs(0), **CFG)
    sd = state_dict_from_module(eager)

    cold = abstract_construct(lambda: DUSt3R(rngs=nnx.Rngs(0), **CFG))
    missing, unexpected = load_torch_state_dict(cold, sd, to_device=False)
    assert not missing and not unexpected
    cold = materialize(cold)

    np.testing.assert_array_equal(_outputs(eager), _outputs(cold))


def test_cold_path_bf16_cast_on_device():
    eager = DUSt3R(rngs=nnx.Rngs(0), **CFG)
    sd = state_dict_from_module(eager)

    cold = abstract_construct(lambda: DUSt3R(rngs=nnx.Rngs(0), **CFG))
    load_torch_state_dict(cold, sd, to_device=False)
    cold = materialize(cold, param_dtype=jnp.bfloat16)

    # params are bf16 on device, equal to a host-side cast of the originals
    _, cold_state = nnx.split(cold)
    _, eager_state = nnx.split(eager)
    c_leaves = jax.tree.leaves(cold_state)
    e_leaves = jax.tree.leaves(eager_state)
    assert len(c_leaves) == len(e_leaves)
    checked = 0
    for c, e in zip(c_leaves, e_leaves):
        if jax.dtypes.issubdtype(getattr(e, "dtype", None), jax.dtypes.prng_key):
            continue
        if jnp.issubdtype(jnp.dtype(e.dtype), jnp.floating):
            assert c.dtype == jnp.bfloat16
            np.testing.assert_array_equal(np.asarray(c), np.asarray(e, dtype=jnp.bfloat16))
            checked += 1
    assert checked > 10


import pytest


@pytest.mark.parametrize("ext", ["npz", "nsv"])
def test_native_state_roundtrip(tmp_path, ext):
    "save_native_state -> load_native_state -> materialize is bit-exact (both containers)."
    import jax.numpy as jnp

    from uniception_tpu.utils.coldstart import is_native_state, load_native_state, save_native_state

    eager = DUSt3R(rngs=nnx.Rngs(0), **CFG)
    path = str(tmp_path / f"serve.{ext}")
    save_native_state(path, eager, model_name="dust3r_small")
    assert is_native_state(path)

    arrays, meta = load_native_state(path)
    assert meta["model_name"] == "dust3r_small"
    cold = abstract_construct(lambda: DUSt3R(rngs=nnx.Rngs(0), **CFG))
    cold = materialize(cold, arrays=arrays)
    np.testing.assert_array_equal(_outputs(eager), _outputs(cold))

    # pre-cast bf16 save matches an on-device cast of the original params
    path16 = str(tmp_path / f"serve16.{ext}")
    save_native_state(path16, eager, dtype=jnp.bfloat16)
    arrays16, _ = load_native_state(path16)
    cold16 = abstract_construct(lambda: DUSt3R(rngs=nnx.Rngs(0), **CFG))
    cold16 = materialize(cold16, arrays=arrays16, param_dtype=jnp.bfloat16)
    _, st = nnx.split(cold16)
    for leaf in jax.tree.leaves(st):
        if jax.dtypes.issubdtype(getattr(leaf, "dtype", None), jax.dtypes.prng_key):
            continue
        if jnp.issubdtype(jnp.dtype(leaf.dtype), jnp.floating):
            assert leaf.dtype == jnp.bfloat16


def test_native_state_shape_mismatch_raises(tmp_path):
    from uniception_tpu.utils.coldstart import load_native_state, save_native_state

    eager = DUSt3R(rngs=nnx.Rngs(0), **CFG)
    path = str(tmp_path / "serve.npz")
    save_native_state(path, eager)
    arrays, _ = load_native_state(path)
    k = next(iter(arrays))
    arrays[k] = arrays[k].reshape(1, *arrays[k].shape)
    cold = abstract_construct(lambda: DUSt3R(rngs=nnx.Rngs(0), **CFG))
    try:
        materialize(cold, arrays=arrays)
        raise AssertionError("expected shape mismatch")
    except ValueError as e:
        assert "shape" in str(e)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_materialize_onto_tp_mesh():
    """materialize(mesh=, use_tp=True) transfers each leaf directly into the
    sharding tp_shard_state would give it, with identical outputs."""
    from jax.sharding import NamedSharding

    from uniception_tpu.parallel.mesh import leaf_tp_spec, make_mesh
    from uniception_tpu.utils.pytree import keypath_str

    eager = DUSt3R(rngs=nnx.Rngs(0), **CFG)
    sd = state_dict_from_module(eager)

    mesh = make_mesh(data=4, model=2)
    cold = abstract_construct(lambda: DUSt3R(rngs=nnx.Rngs(0), **CFG))
    load_torch_state_dict(cold, sd, to_device=False)
    cold = materialize(cold, mesh=mesh, use_tp=True)

    _, state = nnx.split(cold)
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    n_sharded = 0
    for keypath, leaf in flat:
        if jax.dtypes.issubdtype(getattr(leaf, "dtype", None), jax.dtypes.prng_key):
            continue
        path = keypath_str(keypath)
        want = NamedSharding(mesh, leaf_tp_spec(path, leaf, mesh))
        assert leaf.sharding.is_equivalent_to(want, leaf.ndim), (path, leaf.sharding, want)
        if any(a is not None for a in leaf.sharding.spec):
            n_sharded += 1
    assert n_sharded > 5, "expected TP rules to shard the trunk projections"

    # sharded matmuls psum partial products — reduction order differs from
    # dense, so tolerance not bit-exactness (observed max abs ~4e-5 at f32)
    np.testing.assert_allclose(_outputs(eager), _outputs(cold), atol=1e-4, rtol=1e-3)


def test_unloaded_leaves_become_zeros():
    "Leaves a checkpoint does not carry materialize as zeros, not garbage."
    cold = abstract_construct(lambda: DUSt3R(rngs=nnx.Rngs(0), **CFG))
    # load nothing at all
    cold = materialize(cold)
    _, state = nnx.split(cold)
    for leaf in jax.tree.leaves(state):
        if jax.dtypes.issubdtype(getattr(leaf, "dtype", None), jax.dtypes.prng_key):
            continue
        assert not np.any(np.asarray(leaf)), "expected zeros"
