"""
landscape_only: END-TO-END correct ManyAR mixed-orientation batches.

The reference documents this flag but never implements it
(/root/reference/uniception/models/factory/dust3r.py:83 — accepted, unused):
its portrait samples get canvas-grid RoPE positions inside the decoder and
canvas-scrambled head outputs. Vanilla CroCo fixes it dynamically
(transpose_to_landscape), which is data-dependent control flow. Our static
version (true per-sample positions into info-sharing RoPE + dual-pass heads
with a per-row where-select) must make every row of a mixed batch EQUAL the
same image run alone in its native orientation — the strongest available
oracle, and one the reference itself cannot pass.
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.factory.dust3r import DUSt3R

CFG = dict(
    enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
    info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
)
SHORT, LONG = 32, 48  # patch 16 -> 2x3 / 3x2 grids


def _build(patch_cls, head, landscape_only=False, scan_blocks=False):
    cfg = dict(CFG)
    if head == "dpt":
        cfg["info_sharing_depth"] = 9  # IFR hooks [5, 8] (reference config) need depth >= 9
    return DUSt3R(
        name="lo_test", img_size=(SHORT, LONG), patch_embed_cls=patch_cls,
        pred_head_type=head, landscape_only=landscape_only, scan_blocks=scan_blocks,
        rngs=nnx.Rngs(0), **cfg,
    )


def _mixed_batch(seed):
    """Row 0: landscape (SHORT x LONG). Row 1: portrait (LONG x SHORT),
    stored transposed in the landscape canvas (the ManyAR convention)."""
    rng = np.random.RandomState(seed)
    land = rng.randn(3, SHORT, LONG).astype(np.float32)
    port = rng.randn(3, LONG, SHORT).astype(np.float32)
    canvas = np.stack([land, np.swapaxes(port, -1, -2)])
    ts = np.array([[SHORT, LONG], [LONG, SHORT]], np.int32)
    return jnp.asarray(canvas), jnp.asarray(ts), jnp.asarray(land[None]), jnp.asarray(port[None])


@pytest.mark.parametrize("head", ["linear", pytest.param("dpt", marks=pytest.mark.slow)])
def test_mixed_orientation_rows_match_native_runs(head):
    img1, ts1, land1, port1 = _mixed_batch(0)
    img2, ts2, land2, port2 = _mixed_batch(1)

    m = _build("ManyAR_PatchEmbed", head, landscape_only=True)
    res1, res2 = m.forward_pair(img1, img2, true_shape1=ts1, true_shape2=ts2)

    # oracle: each pair alone, in its native orientation, no ManyAR involved
    m_ref = _build("PatchEmbedDust3R", head)
    ref1_l, ref2_l = m_ref.forward_pair(land1, land2)  # pair 0 (both landscape)
    ref1_p, ref2_p = m_ref.forward_pair(port1, port2)  # pair 1 (both portrait)

    # landscape row: canvas == native
    np.testing.assert_allclose(
        np.asarray(res1["pts3d"][0]), np.asarray(ref1_l["pts3d"][0]), rtol=1e-4, atol=2e-4
    )
    # portrait row: canvas holds the TRANSPOSED native prediction
    np.testing.assert_allclose(
        np.asarray(res1["pts3d"][1]),
        np.asarray(jnp.swapaxes(ref1_p["pts3d"][0], 0, 1)),
        rtol=1e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res2["pts3d_in_other_view"][1]),
        np.asarray(jnp.swapaxes(ref2_p["pts3d_in_other_view"][0], 0, 1)),
        rtol=1e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res1["conf"][1]),
        np.asarray(jnp.swapaxes(ref1_p["conf"][0], 0, 1)),
        rtol=1e-4, atol=2e-4,
    )


def test_reference_behavior_breaks_portrait_rows():
    "Sanity: without the flag (= the reference's actual behavior) portrait rows scramble."
    img1, ts1, _, port1 = _mixed_batch(0)
    img2, ts2, _, port2 = _mixed_batch(1)

    m = _build("ManyAR_PatchEmbed", "linear", landscape_only=False)
    res1, _ = m.forward_pair(img1, img2, true_shape1=ts1, true_shape2=ts2)

    m_ref = _build("PatchEmbedDust3R", "linear")
    ref1_p, _ = m_ref.forward_pair(port1, port2)
    assert not np.allclose(
        np.asarray(res1["pts3d"][1]),
        np.asarray(jnp.swapaxes(ref1_p["pts3d"][0], 0, 1)),
        rtol=1e-3, atol=1e-3,
    )


def test_pack_extract_roundtrip_through_model():
    "Host workflow: pack_views -> model -> extract_view recovers native-orientation preds."
    from uniception_tpu.data import extract_view, pack_views

    rng = np.random.RandomState(7)
    land = rng.randn(3, SHORT, LONG).astype(np.float32)
    port = rng.randn(3, LONG, SHORT).astype(np.float32)
    canvas, ts = pack_views([land, port])
    assert canvas.shape == (2, 3, SHORT, LONG) and ts.tolist() == [[SHORT, LONG], [LONG, SHORT]]

    m = _build("ManyAR_PatchEmbed", "linear", landscape_only=True)
    res1, _ = m.forward_pair(jnp.asarray(canvas), jnp.asarray(canvas), true_shape1=jnp.asarray(ts), true_shape2=jnp.asarray(ts))

    m_ref = _build("PatchEmbedDust3R", "linear")
    ref_p, _ = m_ref.forward_pair(jnp.asarray(port[None]), jnp.asarray(port[None]))
    native = extract_view(np.asarray(res1["pts3d"][1]), ts[1])
    assert native.shape == (LONG, SHORT, 3)
    np.testing.assert_allclose(native, np.asarray(ref_p["pts3d"][0]), rtol=1e-4, atol=2e-4)


@pytest.mark.slow
def test_gradients_through_mixed_batch_match_native():
    """Training oracle: d(loss on the portrait row)/d(input) through the
    mixed ManyAR batch equals the native-orientation run's input gradient
    (transposed into the canvas) — backward through positions-into-RoPE,
    dual-pass heads, and the per-row where-select."""
    img1, ts1, land1, port1 = _mixed_batch(2)
    img2, ts2, land2, port2 = _mixed_batch(3)
    rng = np.random.RandomState(9)
    tgt_native = jnp.asarray(rng.randn(LONG, SHORT, 3).astype(np.float32))

    m = _build("ManyAR_PatchEmbed", "linear", landscape_only=True)

    def loss_mixed(a, b):
        res1, _ = m.forward_pair(a, b, true_shape1=ts1, true_shape2=ts2)
        # portrait row in canvas layout = transposed native prediction
        return jnp.sum((res1["pts3d"][1] - jnp.swapaxes(tgt_native, 0, 1)) ** 2)

    g_mixed = jax.grad(loss_mixed)(img1, img2)[1]  # (3, SHORT, LONG) canvas row

    m_ref = _build("PatchEmbedDust3R", "linear")

    def loss_native(a, b):
        r1, _ = m_ref.forward_pair(a, b)
        return jnp.sum((r1["pts3d"][0] - tgt_native) ** 2)

    g_native = jax.grad(loss_native)(port1, port2)[0]  # (3, LONG, SHORT)

    np.testing.assert_allclose(
        np.asarray(g_mixed), np.asarray(jnp.swapaxes(g_native, -1, -2)), rtol=1e-3, atol=1e-4
    )


def test_global_transformer_honors_caller_positions():
    "MultiViewTransformerInput.positions also feeds global/alternating RoPE."
    from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput
    from uniception_tpu.models.info_sharing.global_attention_transformer import (
        MultiViewGlobalAttentionTransformer,
    )
    from uniception_tpu.models.utils.positional_encoding import make_patch_positions

    m = nnx.jit(lambda mod, inp: mod(inp).features[0])
    mod = MultiViewGlobalAttentionTransformer(
        name="pos_test", input_embed_dim=48, dim=64, depth=2, num_heads=4,
        custom_positional_encoding="rope", rngs=nnx.Rngs(0),
    )
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(2, 48, 2, 3).astype(np.float32)) for _ in range(2)]

    default = m(mod, MultiViewTransformerInput(features=feats))
    same = make_patch_positions(2, 2, 3)
    explicit = m(mod, MultiViewTransformerInput(features=feats, positions=[same, same]))
    np.testing.assert_array_equal(np.asarray(default), np.asarray(explicit))

    transposed = make_patch_positions(2, 3, 2)
    changed = m(mod, MultiViewTransformerInput(features=feats, positions=[transposed, transposed]))
    assert not np.allclose(np.asarray(default), np.asarray(changed), atol=1e-5)


def test_all_landscape_is_bit_identical_to_flag_off():
    "With homogeneous landscape inputs the flag must not change outputs at all."
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(2, 3, SHORT, LONG).astype(np.float32))
    img2 = jnp.asarray(rng.randn(2, 3, SHORT, LONG).astype(np.float32))
    ts = jnp.asarray(np.tile([[SHORT, LONG]], (2, 1)).astype(np.int32))

    m_on = _build("ManyAR_PatchEmbed", "linear", landscape_only=True)
    m_off = _build("ManyAR_PatchEmbed", "linear", landscape_only=False)
    r_on, _ = m_on.forward_pair(img1, img2, true_shape1=ts, true_shape2=ts)
    r_off, _ = m_off.forward_pair(img1, img2, true_shape1=ts, true_shape2=ts)
    np.testing.assert_array_equal(np.asarray(r_on["pts3d"]), np.asarray(r_off["pts3d"]))
    np.testing.assert_array_equal(np.asarray(r_on["conf"]), np.asarray(r_off["conf"]))


def test_pack_views_rejects_mixed_canvas_sizes_with_guidance():
    from uniception_tpu.data import pack_views

    with pytest.raises(ValueError, match="bucket images"):
        pack_views([np.zeros((3, 32, 48), np.float32), np.zeros((3, 64, 96), np.float32)])


def test_chain_stages_reject_landscape_only():
    from uniception_tpu.parallel.chain import dust3r_chain_stages

    m = _build("ManyAR_PatchEmbed", "linear", landscape_only=True)
    with pytest.raises(NotImplementedError, match="landscape_only"):
        dust3r_chain_stages(m)


def test_landscape_only_composes_with_scan_layout():
    "Serving default (scan_blocks=True): mixed rows still match native runs."
    img1, ts1, land1, port1 = _mixed_batch(4)
    img2, ts2, land2, port2 = _mixed_batch(5)

    m = _build("ManyAR_PatchEmbed", "linear", landscape_only=True, scan_blocks=True)
    res1, _ = m.forward_pair(img1, img2, true_shape1=ts1, true_shape2=ts2)

    m_ref = _build("PatchEmbedDust3R", "linear", scan_blocks=True)
    ref_p, _ = m_ref.forward_pair(port1, port2)
    np.testing.assert_allclose(
        np.asarray(res1["pts3d"][1]),
        np.asarray(jnp.swapaxes(ref_p["pts3d"][0], 0, 1)),
        rtol=1e-4, atol=2e-4,
    )
