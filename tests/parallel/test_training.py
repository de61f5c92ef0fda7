"""
Sharded training step: loss decreases over a few steps on the 8-way CPU
mesh, with dp and dp+tp layouts, plus Orbax save/restore round trip.
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.parallel.mesh import shard_batch
from uniception_tpu.parallel.training import make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

SMALL = dict(
    img_size=(32, 32), enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
    info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
)


@pytest.mark.parametrize("model_axis,use_tp", [(1, False), pytest.param(2, True, marks=pytest.mark.slow)])
def test_train_step_decreases_loss(model_axis, use_tp):
    model = DUSt3R(name="train_test", rngs=nnx.Rngs(0), **SMALL)
    ctx, params, opt_state = make_train_step(
        model, learning_rate=1e-3, data=8 // model_axis, model_axis=model_axis, use_tp=use_tp
    )

    rng = np.random.RandomState(0)
    batch = 8
    img1 = jnp.asarray(rng.randn(batch, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(batch, 3, 32, 32).astype(np.float32))
    t1 = jnp.asarray(rng.randn(batch, 32, 32, 3).astype(np.float32))
    t2 = jnp.asarray(rng.randn(batch, 32, 32, 3).astype(np.float32))

    with ctx.mesh:
        img1, img2, t1, t2 = shard_batch((img1, img2, t1, t2), ctx.mesh)
        losses = []
        for _ in range(5):
            loss, params, opt_state = ctx.step(params, opt_state, img1, img2, t1, t2)
            losses.append(float(loss))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


@pytest.mark.slow
def test_zero1_matches_unsharded_and_shards_moments():
    """ZeRO-1 must change the optimizer-state layout, not the math: the
    loss trajectory equals the replicated-optimizer run, and the Adam
    moments actually carry a "data" axis in their sharding spec."""
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    img1, img2, t1, t2 = mk(8, 3, 32, 32), mk(8, 3, 32, 32), mk(8, 32, 32, 3), mk(8, 32, 32, 3)

    def run(zero1):
        model = DUSt3R(name="zero1_test", rngs=nnx.Rngs(0), **SMALL)
        ctx, params, opt_state = make_train_step(model, learning_rate=1e-3, data=8, zero1=zero1)
        losses = []
        with ctx.mesh:
            b = shard_batch((img1, img2, t1, t2), ctx.mesh)
            for _ in range(4):
                loss, params, opt_state = ctx.step(params, opt_state, *b)
                losses.append(float(loss))
        return losses, opt_state

    losses_ref, _ = run(zero1=False)
    losses_z1, opt_state = run(zero1=True)
    np.testing.assert_allclose(losses_z1, losses_ref, rtol=1e-5, atol=1e-6)

    # the moments must come back from the step still data-sharded
    sharded = [
        x
        for x in jax.tree.leaves(opt_state)
        if hasattr(x, "sharding") and "data" in tuple(getattr(x.sharding, "spec", ()))
    ]
    assert len(sharded) > 0, "no optimizer-state leaf is sharded over the data axis"
    dev_counts = {len(x.sharding.device_set) for x in sharded}
    assert dev_counts == {8}, f"sharded moments should span all 8 devices: {dev_counts}"


@pytest.mark.parametrize("model_axis,use_tp", [(1, False), pytest.param(2, True, marks=pytest.mark.slow)])
def test_fsdp_matches_replicated_and_shards_params(model_axis, use_tp):
    """FSDP must change the parameter layout, not the math: the loss
    trajectory matches the replicated run, the params come back from the
    step still data-sharded, and per-chip parameter bytes actually drop."""
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    img1, img2, t1, t2 = mk(8, 3, 32, 32), mk(8, 3, 32, 32), mk(8, 32, 32, 3), mk(8, 32, 32, 3)

    def run(fsdp):
        model = DUSt3R(name="fsdp_test", rngs=nnx.Rngs(0), **SMALL)
        ctx, params, opt_state = make_train_step(
            model, learning_rate=1e-3, data=8 // model_axis, model_axis=model_axis,
            use_tp=use_tp, fsdp=fsdp,
        )
        losses = []
        with ctx.mesh:
            b = shard_batch((img1, img2, t1, t2), ctx.mesh)
            for _ in range(4):
                loss, params, opt_state = ctx.step(params, opt_state, *b)
                losses.append(float(loss))
        return losses, params, opt_state

    losses_ref, _, _ = run(fsdp=False)
    losses_fsdp, params, opt_state = run(fsdp=True)
    # sharded all-gather/reduce-scatter reorders reductions: tolerance
    np.testing.assert_allclose(losses_fsdp, losses_ref, rtol=1e-4, atol=1e-5)

    data_size = 8 // model_axis
    def frac_sharded(tree):
        total = local = 0
        n_data = 0
        for x in jax.tree.leaves(tree):
            if not hasattr(x, "sharding"):
                continue
            spec = tuple(getattr(x.sharding, "spec", ()))
            total += x.nbytes
            local += x.nbytes // int(np.prod([
                data_size if a == "data" else (model_axis if a == "model" else 1)
                for a in spec
            ] or [1]))
            if "data" in spec:
                n_data += 1
        return n_data, local / max(total, 1)

    n_data_p, frac_p = frac_sharded(params)
    assert n_data_p > 0, "no parameter leaf is data-sharded after the step"
    assert frac_p < 0.35, f"per-chip param bytes should drop ~{1/data_size:.2f}x: {frac_p:.2f}"
    # optimizer moments inherit the sharding from tx.init on sharded params
    n_data_o, frac_o = frac_sharded(opt_state)
    assert n_data_o > 0 and frac_o < 0.5


@pytest.mark.slow
def test_fsdp_with_grad_accum_matches_replicated():
    """fsdp composes with optax.MultiSteps: the accumulator state mirrors
    the (sharded) params, so the same largest-free-axis rule must shard it
    and the accumulated trajectory must match the replicated run."""
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    img1, img2, t1, t2 = mk(8, 3, 32, 32), mk(8, 3, 32, 32), mk(8, 32, 32, 3), mk(8, 32, 32, 3)

    def run(fsdp):
        model = DUSt3R(name="fsdp_accum_test", rngs=nnx.Rngs(0), **SMALL)
        ctx, params, opt_state = make_train_step(
            model, learning_rate=1e-3, data=8, grad_accum=2, fsdp=fsdp,
        )
        losses = []
        with ctx.mesh:
            b = shard_batch((img1, img2, t1, t2), ctx.mesh)
            for _ in range(4):  # 2 optimizer updates through the accumulator
                loss, params, opt_state = ctx.step(params, opt_state, *b)
                losses.append(float(loss))
        return losses, params

    losses_ref, _ = run(fsdp=False)
    losses_fsdp, params = run(fsdp=True)
    np.testing.assert_allclose(losses_fsdp, losses_ref, rtol=1e-4, atol=1e-5)
    assert any(
        "data" in tuple(getattr(getattr(x, "sharding", None), "spec", ()))
        for x in jax.tree.leaves(params)
    ), "no parameter leaf is data-sharded after the accumulated step"


@pytest.mark.slow
def test_gradient_checkpointing_matches_no_remat():
    "remat must change memory, not math: identical loss and grads."
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    t1 = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))

    def loss_and_grads(remat):
        from uniception_tpu.parallel.training import dust3r_confidence_loss

        model = DUSt3R(name="remat_test", gradient_checkpointing=remat, rngs=nnx.Rngs(0), **SMALL)
        graphdef, params, rest = nnx.split(model, nnx.Param, ...)

        def loss_fn(params):
            m = nnx.merge(graphdef, params, rest)
            r1, r2 = m.forward_pair(img1, img2)
            return dust3r_confidence_loss(r1, r2, t1, t1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return float(loss), grads

    l0, g0 = loss_and_grads(False)
    l1, g1 = loss_and_grads(True)
    assert abs(l0 - l1) < 1e-6
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_save_restore_continue_matches_uninterrupted(tmp_path):
    """save -> restore -> continue must equal uninterrupted training: the
    checkpoint round-trips params, optimizer moments AND the step counter
    (a dropped opt_state would silently reset Adam and diverge here)."""
    from uniception_tpu.parallel.training import restore_train_state, save_train_state

    def data():
        rng = np.random.RandomState(0)
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
        return mk(8, 3, 32, 32), mk(8, 3, 32, 32), mk(8, 32, 32, 3), mk(8, 32, 32, 3)

    # uninterrupted: 4 steps
    model = DUSt3R(name="ckpt_test", rngs=nnx.Rngs(0), **SMALL)
    ctx, params, opt_state = make_train_step(model, learning_rate=1e-3, data=8)
    img1, img2, t1, t2 = data()
    with ctx.mesh:
        img1, img2, t1, t2 = shard_batch((img1, img2, t1, t2), ctx.mesh)
        for _ in range(4):
            loss_ref, params, opt_state = ctx.step(params, opt_state, img1, img2, t1, t2)

    # interrupted: 2 steps, save, restore into a FRESH model/optimizer, 2 more
    model2 = DUSt3R(name="ckpt_test", rngs=nnx.Rngs(0), **SMALL)
    ctx2, params2, opt_state2 = make_train_step(model2, learning_rate=1e-3, data=8)
    with ctx2.mesh:
        for _ in range(2):
            _, params2, opt_state2 = ctx2.step(params2, opt_state2, img1, img2, t1, t2)
    save_train_state(str(tmp_path / "ckpt"), params2, opt_state2, step=2)

    model3 = DUSt3R(name="ckpt_test", rngs=nnx.Rngs(1), **SMALL)  # different init
    ctx3, params3, opt_state3 = make_train_step(model3, learning_rate=1e-3, data=8)
    params3, opt_state3, step = restore_train_state(str(tmp_path / "ckpt"), params3, opt_state3)
    assert step == 2
    assert opt_state3 is not None
    with ctx3.mesh:
        for _ in range(4 - step):
            loss_resumed, params3, opt_state3 = ctx3.step(params3, opt_state3, img1, img2, t1, t2)

    np.testing.assert_allclose(float(loss_resumed), float(loss_ref), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_normalized_loss_is_scale_invariant():
    "norm_mode='avg_dis': scaling preds AND targets by any factor leaves the loss unchanged."
    from uniception_tpu.parallel.training import dust3r_confidence_loss, normalize_pointmaps

    rng = np.random.RandomState(0)
    B, H, W = 2, 8, 8
    pts1 = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    pts2 = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    conf = jnp.asarray(1.0 + rng.rand(B, H, W, 1).astype(np.float32))
    t1 = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    t2 = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid1 = jnp.asarray(rng.rand(B, H, W) > 0.3)
    valid2 = jnp.asarray(rng.rand(B, H, W) > 0.3)

    def mk(p1, p2):
        return {"pts3d": p1, "conf": conf}, {"pts3d_in_other_view": p2, "conf": conf}

    r1, r2 = mk(pts1, pts2)
    base = dust3r_confidence_loss(r1, r2, t1, t2, valid1=valid1, valid2=valid2, norm_mode="avg_dis")
    s1, s2 = mk(pts1 * 7.3, pts2 * 7.3)
    scaled = dust3r_confidence_loss(s1, s2, t1 * 0.11, t2 * 0.11, valid1=valid1, valid2=valid2, norm_mode="avg_dis")
    np.testing.assert_allclose(float(base), float(scaled), rtol=1e-5)

    # default None is the raw metric loss (prior behavior): NOT scale-invariant
    raw = dust3r_confidence_loss(r1, r2, t1, t2, valid1=valid1, valid2=valid2)
    raw_scaled = dust3r_confidence_loss(s1, s2, t1, t2, valid1=valid1, valid2=valid2)
    assert abs(float(raw) - float(raw_scaled)) > 1e-3

    # normalize_pointmaps: joint scale = mean valid distance over both views
    n1, n2, s = normalize_pointmaps(pts1, pts2, valid1, valid2)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(pts1 / s), rtol=1e-6)
    for b in range(B):
        db = np.concatenate(
            [np.linalg.norm(np.asarray(pts1[b]), axis=-1)[np.asarray(valid1[b])],
             np.linalg.norm(np.asarray(pts2[b]), axis=-1)[np.asarray(valid2[b])]]
        )
        np.testing.assert_allclose(float(s[b, 0, 0, 0]), db.mean(), rtol=1e-5)


@pytest.mark.slow
def test_clip_grad_norm_and_metrics():
    """clip_grad_norm bounds the update's global norm exactly (proven with
    SGD, where update = lr * clipped_grad); metrics=True reports the
    UNCLIPPED global grad norm (same value with and without clipping)."""
    import optax

    lr, clip = 0.1, 1.0

    def run(clip):
        model = DUSt3R(name="clip_test", rngs=nnx.Rngs(0), **SMALL)
        ctx, params, opt_state = make_train_step(
            model, data=8, clip_grad_norm=clip, metrics=True, tx=optax.sgd(lr)
        )
        rng = np.random.RandomState(0)
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
        img1, img2 = mk(8, 3, 32, 32), mk(8, 3, 32, 32)
        # huge targets -> huge gradients, so clipping visibly matters
        t1, t2 = mk(8, 32, 32, 3) * 1e4, mk(8, 32, 32, 3) * 1e4
        with ctx.mesh:
            img1, img2, t1, t2 = shard_batch((img1, img2, t1, t2), ctx.mesh)
            before = [np.asarray(x) for x in jax.tree.leaves(params)]
            loss, aux, params, opt_state = ctx.step(params, opt_state, img1, img2, t1, t2)
        update_norm = float(
            np.sqrt(
                sum(
                    float(np.sum((np.asarray(a) - b) ** 2))
                    for a, b in zip(jax.tree.leaves(params), before)
                )
            )
        )
        return float(aux["grad_norm"]), update_norm

    gn_unclipped, un_unclipped = run(clip=None)
    gn_clipped, un_clipped = run(clip=clip)
    assert np.isfinite(gn_unclipped) and gn_unclipped > 10.0  # big grads by construction
    # metric reports the raw gradient norm, not the clipped one
    np.testing.assert_allclose(gn_clipped, gn_unclipped, rtol=1e-5)
    # sgd: unclipped update norm = lr*gn; clipped = lr*clip exactly
    np.testing.assert_allclose(un_unclipped, lr * gn_unclipped, rtol=1e-4)
    np.testing.assert_allclose(un_clipped, lr * clip, rtol=1e-4)


@pytest.mark.slow
def test_skip_nonfinite_preserves_state_on_nan_batch():
    """A NaN batch under skip_nonfinite leaves params bit-unchanged; the
    next finite batch trains normally. Without the guard, one NaN batch
    poisons the params forever."""
    model = DUSt3R(name="nanguard_test", rngs=nnx.Rngs(0), **SMALL)
    ctx, params, opt_state = make_train_step(
        model, learning_rate=1e-3, data=8, skip_nonfinite=True
    )
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    img1, img2, t1, t2 = mk(8, 3, 32, 32), mk(8, 3, 32, 32), mk(8, 32, 32, 3), mk(8, 32, 32, 3)
    bad_t1 = t1.at[0, 0, 0, 0].set(jnp.nan)

    with ctx.mesh:
        img1, img2, t1, t2, bad_t1 = shard_batch((img1, img2, t1, t2, bad_t1), ctx.mesh)
        before = [np.asarray(x) for x in jax.tree.leaves(params)]
        loss_bad, params, opt_state = ctx.step(params, opt_state, img1, img2, bad_t1, t2)
        after_bad = [np.asarray(x) for x in jax.tree.leaves(params)]
        loss_ok, params, opt_state = ctx.step(params, opt_state, img1, img2, t1, t2)

    assert not np.isfinite(float(loss_bad))  # the loss itself is NaN...
    for a, b in zip(after_bad, before):  # ...but the params are untouched
        np.testing.assert_array_equal(a, b)
    assert np.isfinite(float(loss_ok))
    changed = any(
        float(np.max(np.abs(np.asarray(a) - b))) > 0
        for a, b in zip(jax.tree.leaves(params), after_bad)
    )
    assert changed, "finite batch after a skipped one must update params"


@pytest.mark.slow
def test_ema_update_math_and_usage():
    "EMA helper: exact math on a toy pytree, and in-loop usage over real steps."
    from uniception_tpu.parallel.training import ema_init, ema_update

    tree = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([[3.0]])}
    ema = ema_init(tree)
    new = {"a": jnp.asarray([2.0, 0.0]), "b": jnp.asarray([[5.0]])}
    ema = ema_update(ema, new, 0.9)
    np.testing.assert_allclose(np.asarray(ema["a"]), [1.0 * 0.9 + 2.0 * 0.1, 2.0 * 0.9], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ema["b"]), [[3.0 * 0.9 + 5.0 * 0.1]], rtol=1e-6)

    model = DUSt3R(name="ema_test", rngs=nnx.Rngs(0), **SMALL)
    ctx, params, opt_state = make_train_step(model, learning_rate=1e-2, data=8)
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    img1, img2, t1, t2 = mk(8, 3, 32, 32), mk(8, 3, 32, 32), mk(8, 32, 32, 3), mk(8, 32, 32, 3)
    expected = np.asarray(jax.tree.leaves(params)[0], np.float64)
    with ctx.mesh:
        img1, img2, t1, t2 = shard_batch((img1, img2, t1, t2), ctx.mesh)
        ema = ema_init(params)
        for _ in range(3):
            _, params, opt_state = ctx.step(params, opt_state, img1, img2, t1, t2)
            ema = ema_update(ema, params, 0.5)
            # host-side recurrence on the first leaf (the oracle)
            expected = expected * 0.5 + np.asarray(jax.tree.leaves(params)[0], np.float64) * 0.5
    e = np.asarray(jax.tree.leaves(ema)[0])
    np.testing.assert_allclose(e, expected.astype(np.float32), rtol=1e-5, atol=1e-7)


def test_async_save_round_trips(tmp_path):
    "save_train_state(wait=False) overlaps the write; contents match a blocking save."
    from uniception_tpu.parallel.training import restore_train_state, save_train_state

    model = DUSt3R(name="async_ckpt_test", rngs=nnx.Rngs(0), **SMALL)
    ctx, params, opt_state = make_train_step(model, learning_rate=1e-3, data=8)
    ckptr = save_train_state(str(tmp_path / "async"), params, opt_state, step=7, wait=False)
    assert ckptr is not None
    # training may continue here (donated steps are safe: Orbax snapshotted
    # the arrays to host before returning)
    ckptr.wait_until_finished()

    model2 = DUSt3R(name="async_ckpt_test", rngs=nnx.Rngs(1), **SMALL)
    ctx2, params2, opt_state2 = make_train_step(model2, learning_rate=1e-3, data=8)
    params2, opt_state2, step = restore_train_state(str(tmp_path / "async"), params2, opt_state2)
    assert step == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multiview_loss_matches_pairwise_and_is_scale_invariant():
    """multiview_confidence_loss == dust3r_confidence_loss at N=2, and the
    N-view avg_dis normalization is scale-invariant at N=4."""
    from uniception_tpu.parallel.training import (
        dust3r_confidence_loss,
        multiview_confidence_loss,
    )

    rng = np.random.RandomState(0)
    B, H, W = 2, 8, 8
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    pts = [mk(B, H, W, 3) for _ in range(4)]
    confs = [jnp.asarray(1.0 + rng.rand(B, H, W, 1).astype(np.float32)) for _ in range(4)]
    tgts = [mk(B, H, W, 3) for _ in range(4)]
    valids = [jnp.asarray(rng.rand(B, H, W) > 0.3) for _ in range(4)]
    results = [{"pts3d": p, "conf": c} for p, c in zip(pts, confs)]

    # N=2 equivalence with the pairwise loss (no norm and avg_dis)
    r1 = {"pts3d": pts[0], "conf": confs[0]}
    r2 = {"pts3d_in_other_view": pts[1], "conf": confs[1]}
    for nm in (None, "avg_dis"):
        pair = dust3r_confidence_loss(
            r1, r2, tgts[0], tgts[1], valid1=valids[0], valid2=valids[1], norm_mode=nm
        )
        multi = multiview_confidence_loss(
            results[:2], tgts[:2], valids=valids[:2], norm_mode=nm
        )
        np.testing.assert_allclose(float(multi), float(pair), rtol=1e-6)

    # N=4 scale invariance of avg_dis
    base = multiview_confidence_loss(results, tgts, valids=valids, norm_mode="avg_dis")
    scaled_results = [{"pts3d": p * 9.1, "conf": c} for p, c in zip(pts, confs)]
    scaled = multiview_confidence_loss(
        scaled_results, [t * 0.07 for t in tgts], valids=valids, norm_mode="avg_dis"
    )
    np.testing.assert_allclose(float(base), float(scaled), rtol=1e-5)


@pytest.mark.parametrize("attention_type", ["global", pytest.param("alternating", marks=pytest.mark.slow)])
def test_multiview_training_step_decreases_loss(attention_type):
    """The train-step factory is not DUSt3R-pair-specific: an N-view
    VGGT-style model (factory/multiview.py) trains through it by packing
    the views/targets lists into the step's pytree slots."""
    from uniception_tpu.models.factory.multiview import MultiViewPointmapModel
    from uniception_tpu.parallel.training import multiview_confidence_loss

    V = 3
    model = MultiViewPointmapModel(
        name="mv_train",
        num_views=V,
        img_size=(32, 32),
        attention_type=attention_type,
        enc_embed_dim=64,
        enc_depth=2,
        enc_num_heads=4,
        info_sharing_dim=64,
        info_sharing_depth=2,
        info_sharing_num_heads=4,
        rngs=nnx.Rngs(0),
    )

    def loss_fn(m, views, _unused1, targets, _unused2):
        return multiview_confidence_loss(m(views), targets, norm_mode="avg_dis")

    ctx, params, opt_state = make_train_step(model, loss_fn=loss_fn, learning_rate=1e-3, data=8)
    rng = np.random.RandomState(0)
    views = [jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32)) for _ in range(V)]
    targets = [jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32)) for _ in range(V)]

    with ctx.mesh:
        views, targets = shard_batch((views, targets), ctx.mesh)
        losses = []
        for _ in range(5):
            loss, params, opt_state = ctx.step(params, opt_state, views, (), targets, ())
            losses.append(float(loss))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


@pytest.mark.slow
def test_trainable_freezes_encoder_and_matches_unfrozen_updates():
    """trainable= predicate: frozen leaves bit-identical across steps, no
    moments allocated for them, and the FIRST step's trainable-leaf values
    bit-match an unfrozen run's (per-leaf adamw; stop_gradient only cuts
    the leaves' own wgrads, not the activation gradient chain — later
    steps diverge because the unfrozen run keeps moving the encoder)."""
    from uniception_tpu.utils.pytree import state_paths

    rng = np.random.RandomState(1)
    batch = 8
    img1 = jnp.asarray(rng.randn(batch, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(batch, 3, 32, 32).astype(np.float32))
    t1 = jnp.asarray(rng.randn(batch, 32, 32, 3).astype(np.float32))
    t2 = jnp.asarray(rng.randn(batch, 32, 32, 3).astype(np.float32))

    def run(trainable, steps):
        model = DUSt3R(name="freeze_test", rngs=nnx.Rngs(0), **SMALL)
        ctx, params, opt_state = make_train_step(
            model, learning_rate=1e-3, data=8, trainable=trainable
        )
        init = jax.tree.map(lambda x: np.asarray(x), params)
        snaps = []
        with ctx.mesh:
            a, b, c, d = shard_batch((img1, img2, t1, t2), ctx.mesh)
            for _ in range(steps):
                loss, params, opt_state = ctx.step(params, opt_state, a, b, c, d)
                snaps.append(jax.tree.map(lambda x: np.asarray(x), params))
        return init, snaps, opt_state, float(loss)

    is_trainable = lambda p: not p.startswith("encoder.")
    init_f, snaps_f, opt_f, loss_f = run(is_trainable, 3)
    _, snaps_u, opt_u, _ = run(None, 1)
    final_f = snaps_f[-1]

    paths = state_paths(final_f)
    leaves = list(zip(paths, jax.tree.leaves(init_f), jax.tree.leaves(final_f),
                      jax.tree.leaves(snaps_f[0]), jax.tree.leaves(snaps_u[0])))
    froz = [x for x in leaves if x[0].startswith("encoder.")]
    train = [x for x in leaves if not x[0].startswith("encoder.")]
    assert froz and train
    # frozen leaves did not move over 3 steps
    for p, i, f, _, _ in froz:
        np.testing.assert_array_equal(i, f, err_msg=p)
    # trainable leaves moved
    assert any(not np.array_equal(i, f) for _, i, f, _, _ in train)
    # first-step trainable values match the unfrozen run's first step
    for p, _, _, s1f, s1u in train:
        np.testing.assert_array_equal(s1f, s1u, err_msg=p)
    assert np.isfinite(loss_f)
    # optimizer moments not allocated for frozen leaves: the frozen run's
    # opt_state holds strictly fewer array elements than the unfrozen one's
    n_elems = lambda t: sum(x.size for x in jax.tree.leaves(t) if hasattr(x, "size"))
    assert n_elems(opt_f) < n_elems(opt_u)
    n_frozen = sum(i.size for _, i, _, _, _ in froz)
    assert n_elems(opt_u) - n_elems(opt_f) >= 2 * n_frozen  # mu + nu per frozen leaf


@pytest.mark.slow
def test_trainable_composes_with_fsdp():
    """Frozen encoder under FSDP: params stay data-sharded across donated
    steps, frozen leaves stay bit-identical, loss decreases."""
    from uniception_tpu.utils.pytree import state_paths

    model = DUSt3R(name="freeze_fsdp", rngs=nnx.Rngs(0), **SMALL)
    ctx, params, opt_state = make_train_step(
        model, learning_rate=1e-3, data=8, fsdp=True,
        trainable=lambda p: not p.startswith("encoder."),
    )
    init = jax.tree.map(lambda x: np.asarray(x), params)

    rng = np.random.RandomState(4)
    img1 = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    t1 = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    t2 = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))

    losses = []
    with ctx.mesh:
        a, b, c, d = shard_batch((img1, img2, t1, t2), ctx.mesh)
        for _ in range(4):
            loss, params, opt_state = ctx.step(params, opt_state, a, b, c, d)
            losses.append(float(loss))

    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses
    # frozen leaves bit-identical; params still sharded (not re-replicated)
    n_sharded = 0
    for p, i, f in zip(state_paths(params), jax.tree.leaves(init), jax.tree.leaves(params)):
        if p.startswith("encoder."):
            np.testing.assert_array_equal(i, np.asarray(f), err_msg=p)
        if not f.sharding.is_fully_replicated:
            n_sharded += 1
    assert n_sharded > 0


def test_losses_survive_nan_target_sentinels():
    """NaN/inf ground truth at invalid pixels (standard dataset sentinels)
    must not poison the loss or its gradients — the double-where fix: the
    difference is masked BEFORE the norm, not just the per-pixel loss."""
    from uniception_tpu.parallel.training import (
        dust3r_confidence_loss,
        flow_confidence_loss,
        multiview_confidence_loss,
    )

    rng = np.random.RandomState(0)
    B, H, W = 1, 4, 4
    valid = jnp.asarray(rng.rand(B, H, W) > 0.4)

    def poison(t):
        t = np.array(t)
        t[~np.asarray(valid)] = np.nan
        return jnp.asarray(t)

    conf = jnp.asarray(1.0 + rng.rand(B, H, W, 1).astype(np.float32))
    pts1 = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    pts2 = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    t1 = poison(rng.randn(B, H, W, 3).astype(np.float32))
    t2 = poison(rng.randn(B, H, W, 3).astype(np.float32))

    def d_loss(p1):
        r1 = {"pts3d": p1, "conf": conf}
        r2 = {"pts3d_in_other_view": pts2, "conf": conf}
        return dust3r_confidence_loss(r1, r2, t1, t2, valid1=valid, valid2=valid)

    for norm_mode in (None, "avg_dis"):

        def d_loss_n(p1, nm=norm_mode):
            r1 = {"pts3d": p1, "conf": conf}
            r2 = {"pts3d_in_other_view": pts2, "conf": conf}
            return dust3r_confidence_loss(r1, r2, t1, t2, valid1=valid, valid2=valid, norm_mode=nm)

        l, g = jax.value_and_grad(d_loss_n)(pts1)
        assert np.isfinite(float(l)), norm_mode
        assert bool(jnp.all(jnp.isfinite(g))), norm_mode

    tf = poison(rng.randn(B, H, W, 2).astype(np.float32))

    def f_loss(flow):
        return flow_confidence_loss({"flow": flow, "flow_conf": conf}, tf, valid=valid)

    l, g = jax.value_and_grad(f_loss)(jnp.asarray(rng.randn(B, H, W, 2).astype(np.float32)))
    assert np.isfinite(float(l)) and bool(jnp.all(jnp.isfinite(g)))

    def m_loss(p1):
        return multiview_confidence_loss(
            [{"pts3d": p1, "conf": conf}, {"pts3d": pts2, "conf": conf}],
            [t1, t2],
            valids=[valid, valid],
            norm_mode="avg_dis",
        )

    l, g = jax.value_and_grad(m_loss)(pts1)
    assert np.isfinite(float(l)) and bool(jnp.all(jnp.isfinite(g)))
