"""
Zero-cost weight transforms (nn/smooth.py): SmoothQuant scale migration and
QuaRot-style per-head Hadamard rotation must be EXACT fp32 identities on the
network function (they only rewrite weights + adjacent LayerNorm affines),
on both trunk layouts, and their analytic Hessian updates must match a fresh
capture on the transformed model — that equivalence is what lets one
calibration run serve every GPTQ+transform variant.

The reference has no quantization story; these extend the TPU-native int8
serving stack (reference golden gate: examples/models/dust3r/dust3r.py:223-230).
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.models.utils.config import set_attention_impl
from uniception_tpu.nn.gptq import harvest_act_amax, harvest_hessians, install_hessian_capture
from uniception_tpu.nn.smooth import hadamard, head_rotation, rotate_trunk, smooth_trunk


@pytest.fixture(autouse=True)
def _xla_attention():
    from uniception_tpu.models.utils.config import get_attention_impl

    prev = get_attention_impl()
    set_attention_impl("xla")
    yield
    set_attention_impl(prev)


CFG = dict(
    name="smooth_test",
    img_size=(64, 64),
    pred_head_type="linear",
    enc_embed_dim=64,
    enc_depth=2,
    enc_num_heads=4,
    info_sharing_dim=48,
    info_sharing_depth=2,
    info_sharing_num_heads=3,
)


def _model(scan=False, seed=0):
    return DUSt3R(rngs=nnx.Rngs(seed), scan_blocks=scan, **CFG)


def _inputs(seed=1):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32)),
        jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32)),
    )


def _capture(model, img1, img2, pairs=1):
    n = install_hessian_capture(model.encoder, min_params=1)
    n += install_hessian_capture(model.info_sharing, min_params=1)
    assert n > 0
    for _ in range(pairs):
        model.forward_pair(img1, img2)
    amax = harvest_act_amax(model)
    hessians = harvest_hessians(model)
    assert set(amax) == set(hessians)
    return amax, hessians


def test_hadamard_orthogonal():
    for n in (2, 16, 64):
        H = hadamard(n)
        np.testing.assert_allclose(H @ H.T, np.eye(n), atol=1e-12)
    R = head_rotation(16, seed=3)
    np.testing.assert_allclose(R @ R.T, np.eye(16), atol=1e-12)
    with pytest.raises(ValueError):
        hadamard(12)


@pytest.mark.parametrize("scan", [False, True], ids=["loop", "scan"])
@pytest.mark.parametrize("alpha", [0.0, 0.5])
def test_smooth_is_exact_identity(scan, alpha):
    img1, img2 = _inputs()
    ref, _ = _model(scan=scan).forward_pair(img1, img2)

    # stats always captured on the LOOP layout (the calibration pipeline);
    # applied to whichever layout
    calib = _model(scan=False)
    amax, _ = _capture(calib, img1, img2)

    m = _model(scan=scan)
    folds = smooth_trunk(m, amax, alpha=alpha)
    # per self block: qkv+proj+fc1 (3); per cross block: those + projq +
    # projkv + cross-proj (6); scan stacks each branch into ONE block module
    assert folds == (1 * 3 + 2 * 6) if scan else (2 * 3 + 2 * 2 * 6)
    out, _ = m.forward_pair(img1, img2)
    np.testing.assert_allclose(
        np.asarray(out["pts3d"], np.float32), np.asarray(ref["pts3d"], np.float32), atol=2e-5, rtol=1e-5
    )
    # the fold actually moved weights (not a no-op)
    base = _model(scan=scan)
    changed = np.abs(
        np.asarray(m.encoder.enc_blocks[0].norm1.scale[...] if not scan else m.encoder.enc_blocks.norm1.scale[...])
        - np.asarray(
            base.encoder.enc_blocks[0].norm1.scale[...] if not scan else base.encoder.enc_blocks.norm1.scale[...]
        )
    ).max()
    assert changed > 1e-3


@pytest.mark.parametrize("scan", [False, True], ids=["loop", "scan"])
def test_rotate_is_exact_identity(scan):
    img1, img2 = _inputs()
    ref, _ = _model(scan=scan).forward_pair(img1, img2)
    m = _model(scan=scan)
    done = rotate_trunk(m)
    # self block: 1 rotation; cross block: 2 (self-attn + cross-attn);
    # scan stacks each branch into one block module
    assert done == (1 + 2 * 2) if scan else (2 + 2 * 2 * 2)
    out, _ = m.forward_pair(img1, img2)
    np.testing.assert_allclose(
        np.asarray(out["pts3d"], np.float32), np.asarray(ref["pts3d"], np.float32), atol=2e-5, rtol=1e-5
    )


def test_smooth_plus_rotate_composed_identity():
    img1, img2 = _inputs()
    ref, _ = _model(scan=True).forward_pair(img1, img2)
    calib = _model(scan=False)
    amax, _ = _capture(calib, img1, img2)
    m = _model(scan=True)
    assert smooth_trunk(m, amax, alpha=0.25) > 0
    assert rotate_trunk(m) > 0
    out, _ = m.forward_pair(img1, img2)
    np.testing.assert_allclose(
        np.asarray(out["pts3d"], np.float32), np.asarray(ref["pts3d"], np.float32), atol=2e-5, rtol=1e-5
    )


def test_hessian_updates_match_fresh_capture():
    """The analytic Hessian transforms (D^-1 H D^-1 for smoothed inputs,
    B^T H B for rotated proj inputs) must equal Hessians captured on the
    transformed model — the contract that lets GPTQ reuse one capture."""
    img1, img2 = _inputs()
    m1 = _model(scan=False)
    amax, hessians = _capture(m1, img1, img2)

    m2 = _model(scan=False)  # same seed => same weights
    smooth_trunk(m2, amax, alpha=0.5, hessians=hessians)
    rotate_trunk(m2, hessians=hessians, seed=0)
    _, fresh = _capture(m2, img1, img2)

    assert set(fresh) == set(hessians)
    for k in sorted(hessians):
        a, b = hessians[k], fresh[k]
        denom = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(a / denom, b / denom, atol=5e-5, err_msg=k)


def test_int8_bill_improves_on_outlier_model():
    """On a block with a planted activation-outlier channel (a spiked
    LayerNorm gamma — the mechanism behind real transformer outlier
    channels), balanced smoothing (alpha=0.5) must cut the int8 output
    error: the per-token activation scale shrinks ~sqrt(outlier)x for
    every channel while only one weight row grows by the same factor."""
    from uniception_tpu.nn.blocks import SelfAttentionBlock

    rng = np.random.RandomState(0)

    def make_block():
        blk = SelfAttentionBlock(64, num_heads=4, qkv_bias=True, rngs=nnx.Rngs(0))
        g = np.array(blk.norm1.scale[...], np.float32)
        g[3] *= 30.0  # persistent activation-outlier channel into qkv
        blk.norm1.scale[...] = jnp.asarray(g)
        return blk

    x = jnp.asarray(rng.randn(1, 16, 64).astype(np.float32))
    ref = np.asarray(make_block()(x), np.float32)

    def int8_err(blk):
        from uniception_tpu.nn.quant import quantize_linears

        quantize_linears(blk, min_params=1)
        out = np.asarray(blk(x), np.float32)
        return np.linalg.norm(out - ref) / np.linalg.norm(ref)

    e_rtn = int8_err(make_block())

    # real captured stats, balanced migration
    blk_s = make_block()
    n = install_hessian_capture(blk_s, min_params=1)
    assert n >= 1
    blk_s(x)
    amax = harvest_act_amax(blk_s)
    harvest_hessians(blk_s)  # unwrap
    assert amax["attn.qkv"][3] > 10 * np.median(amax["attn.qkv"])
    assert smooth_trunk(blk_s, amax, alpha=0.5) >= 1
    e_smooth = int8_err(blk_s)
    assert e_smooth < e_rtn * 0.7, (e_smooth, e_rtn)
