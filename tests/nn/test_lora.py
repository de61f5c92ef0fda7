"""
LoRA adapters (nn/lora.py): wrap-is-identity, merge fold-back, trainable
predicate composition with make_train_step, and state save/restore across
the wrapped key contract ('fc1.kernel' -> 'fc1.base.kernel').
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.nn import LoRALinear, apply_lora, lora_trainable, merge_lora
from uniception_tpu.utils.pytree import state_paths

SMALL = dict(
    img_size=(32, 32), enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
    info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
)


def _small_dust3r(seed=0):
    return DUSt3R(name="lora_test", rngs=nnx.Rngs(seed), **SMALL)


def _pair(seed=0, batch=2):
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    return mk(batch, 3, 32, 32), mk(batch, 3, 32, 32)


def _fwd(model, img1, img2):
    r1, r2 = model.forward_pair(img1, img2)
    return np.asarray(r1["pts3d"]), np.asarray(r2["pts3d_in_other_view"])


def test_wrap_is_identity():
    "lora_b is zero-init: wrapping changes NOTHING until the adapters train."
    model = _small_dust3r()
    img1, img2 = _pair()
    before = _fwd(model, img1, img2)

    n = apply_lora(model, rank=4, rngs=nnx.Rngs(7), min_params=1)
    assert n > 0
    paths = state_paths(nnx.split(model)[1])
    assert any(".lora_a." in p for p in paths) and any(".base.kernel" in p for p in paths)

    after = _fwd(model, img1, img2)
    np.testing.assert_array_equal(before[0], after[0])
    np.testing.assert_array_equal(before[1], after[1])


def test_merge_matches_wrapped_forward_and_restores_plain_linears():
    """With trained (nonzero) adapters, merge_lora folds W += A @ B * scale in
    place: the merged plain-Linear tree reproduces the wrapped forward and
    carries no lora keys (any serving path sees an ordinary checkpoint)."""
    model = _small_dust3r()
    n = apply_lora(model, rank=4, rngs=nnx.Rngs(7), min_params=1)

    # simulate training: give every adapter a nonzero B (and jitter A)
    rng = np.random.RandomState(3)
    for _, m in nnx.iter_modules(model):
        if isinstance(m, LoRALinear):
            m.lora_b[...] = jnp.asarray(0.03 * rng.randn(*m.lora_b[...].shape), m.lora_b[...].dtype)
            m.lora_a[...] = m.lora_a[...] * 1.1

    img1, img2 = _pair(1)
    wrapped = _fwd(model, img1, img2)

    n_merged = merge_lora(model)
    assert n_merged == n
    paths = state_paths(nnx.split(model)[1])
    assert not any("lora" in p or ".base." in p for p in paths)

    merged = _fwd(model, img1, img2)
    np.testing.assert_allclose(wrapped[0], merged[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(wrapped[1], merged[1], rtol=2e-5, atol=2e-5)


def test_apply_lora_respects_threshold_and_predicate():
    model = _small_dust3r()
    n_qkv = apply_lora(model.encoder, rank=2, rngs=nnx.Rngs(0), min_params=1,
                       predicate=lambda p, _: "qkv" in p)
    paths = state_paths(nnx.split(model)[1])
    lora_paths = [p for p in paths if ".lora_a." in p]
    assert n_qkv == len(lora_paths) > 0
    assert all("qkv" in p for p in lora_paths)

    model2 = _small_dust3r()
    assert apply_lora(model2, rank=2, rngs=nnx.Rngs(0), min_params=1 << 30) == 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_lora_trainable_trains_only_adapters():
    """make_train_step(trainable=lora_trainable): base leaves bit-identical
    across steps, adapters move (B on step 1; A only after B is nonzero —
    dL/dA flows through B), and the optimizer allocates no moments for the
    frozen base."""
    from uniception_tpu.parallel.mesh import shard_batch
    from uniception_tpu.parallel.training import make_train_step

    def build():
        m = _small_dust3r()
        apply_lora(m.encoder, rank=4, rngs=nnx.Rngs(7), min_params=1)
        apply_lora(m.info_sharing, rank=4, rngs=nnx.Rngs(8), min_params=1)
        return m

    rng = np.random.RandomState(2)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    img1, img2, t1, t2 = mk(8, 3, 32, 32), mk(8, 3, 32, 32), mk(8, 32, 32, 3), mk(8, 32, 32, 3)

    def run(trainable, steps):
        # weight_decay=0 so a zero-gradient leaf is exactly stationary
        # (decay would move lora_a on step 1 despite its zero grad)
        ctx, params, opt_state = make_train_step(
            build(), learning_rate=1e-2, weight_decay=0.0, data=8, trainable=trainable
        )
        init = jax.tree.map(np.asarray, params)
        snaps = []
        with ctx.mesh:
            a, b, c, d = shard_batch((img1, img2, t1, t2), ctx.mesh)
            for _ in range(steps):
                loss, params, opt_state = ctx.step(params, opt_state, a, b, c, d)
                snaps.append(jax.tree.map(np.asarray, params))
        return init, snaps, opt_state, float(loss)

    init, snaps, opt_lora, loss = run(lora_trainable, 2)
    assert np.isfinite(loss)
    leaves = list(zip(state_paths(snaps[-1]), jax.tree.leaves(init),
                      jax.tree.leaves(snaps[0]), jax.tree.leaves(snaps[-1])))
    base = [x for x in leaves if not lora_trainable(x[0])]
    l_a = [x for x in leaves if ".lora_a." in x[0]]
    l_b = [x for x in leaves if ".lora_b." in x[0]]
    assert base and l_a and l_b

    for p, i, _, f in base:
        np.testing.assert_array_equal(i, f, err_msg=p)
    # step 1: every lora_b moves (their grad is x@A-weighted, nonzero)
    assert all(not np.array_equal(i, s1) for _, i, s1, _ in l_b)
    # lora_a is stationary on step 1 (grad flows through B=0) but moves by step 2
    assert all(np.array_equal(i, s1) for _, i, s1, _ in l_a)
    assert any(not np.array_equal(s1, f) for _, _, s1, f in l_a)

    # no moments for the frozen base: opt state much smaller than unfrozen
    _, _, opt_full, _ = run(None, 1)
    n_elems = lambda t: sum(x.size for x in jax.tree.leaves(t) if hasattr(x, "size"))
    n_base = sum(i.size for _, i, _, _ in base)
    assert n_elems(opt_full) - n_elems(opt_lora) >= 2 * n_base


def test_wrapped_state_save_restore_roundtrip(tmp_path):
    """The wrapped tree's state (incl. 'base.kernel' keys and adapters)
    round-trips through the checkpoint container into a freshly wrapped
    abstract model and reproduces the forward."""
    from uniception_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    model = _small_dust3r()
    apply_lora(model, rank=4, rngs=nnx.Rngs(7), min_params=1)
    rng = np.random.RandomState(5)
    for _, m in nnx.iter_modules(model):
        if isinstance(m, LoRALinear):
            m.lora_b[...] = jnp.asarray(0.05 * rng.randn(*m.lora_b[...].shape), m.lora_b[...].dtype)

    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    flat = dict(zip(state_paths(params), jax.tree.leaves(params)))
    path = str(tmp_path / "lora.npz")
    save_checkpoint(path, {k: np.asarray(v) for k, v in flat.items()})

    # different-seed construction => different weights until restore
    fresh = _small_dust3r(seed=1)
    apply_lora(fresh, rank=4, rngs=nnx.Rngs(9), min_params=1)
    gd2, p2, rest2 = nnx.split(fresh, nnx.Param, ...)
    loaded = load_checkpoint(path)["model"]
    restored = jax.tree.unflatten(jax.tree.structure(p2),
                                  [jnp.asarray(loaded[p]) for p in state_paths(p2)])
    fresh = nnx.merge(gd2, restored, rest2)

    img1, img2 = _pair(4)
    a = _fwd(model, img1, img2)
    b = _fwd(fresh, img1, img2)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
