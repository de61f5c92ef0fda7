"""Scan-over-stacked-blocks (nn/scan.py): parity with the Python-loop layout
and torch-checkpoint key mapping for stacked params (SURVEY.md §7 build-plan
item 9; reference hot loop uniception/models/encoders/croco.py:147-182)."""

import numpy as np
from flax import nnx

import jax.numpy as jnp

from uniception_tpu.models.encoders.base import ViTEncoderInput
from uniception_tpu.models.encoders.croco import CroCoEncoder, CroCoIntermediateFeatureReturner
from uniception_tpu.nn.blocks import SelfAttentionBlock
from uniception_tpu.nn.scan import make_stacked_blocks, scan_blocks, stacked_state_from_list, unstack_block
from uniception_tpu.utils.torch_compat import load_torch_state_dict, state_dict_from_module

CFG = dict(
    name="scan_test",
    data_norm_type="dust3r",
    patch_embed_cls="PatchEmbedDust3R",
    img_size=(64, 64),
    patch_size=16,
    enc_embed_dim=96,
    enc_depth=4,
    enc_num_heads=4,
)


def _input(seed=0, b=2):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.randn(b, 3, 64, 64).astype(np.float32))
    return ViTEncoderInput(image=img, data_norm_type="dust3r")


def test_stacked_blocks_shapes_and_unstack():
    stacked = make_stacked_blocks(3, lambda r: SelfAttentionBlock(dim=32, num_heads=4, rngs=r), nnx.Rngs(0))
    assert stacked.stacked_depth == 3
    assert stacked.attn.qkv.kernel[...].shape == (3, 32, 96)
    # per-depth inits are independent
    k = np.asarray(stacked.attn.qkv.kernel[...])
    assert not np.allclose(k[0], k[1])
    one = unstack_block(stacked, 1)
    np.testing.assert_array_equal(np.asarray(one.attn.qkv.kernel[...]), k[1])


def test_scan_matches_loop_blocks():
    blocks = [SelfAttentionBlock(dim=32, num_heads=4, rngs=nnx.Rngs(i)) for i in range(3)]
    stacked = make_stacked_blocks(3, lambda r: SelfAttentionBlock(dim=32, num_heads=4, rngs=r), nnx.Rngs(9))
    nnx.update(stacked, stacked_state_from_list(blocks))

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 32).astype(np.float32))
    ref = x
    for b in blocks:
        ref = b(ref)
    out = scan_blocks(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)

    out2, ys = scan_blocks(stacked, x, collect=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)
    assert ys.shape == (3,) + x.shape
    np.testing.assert_allclose(np.asarray(ys[-1]), np.asarray(out), atol=0)


def test_croco_scan_encoder_matches_loop():
    loop = CroCoEncoder(rngs=nnx.Rngs(0), **CFG)
    scan = CroCoEncoder(rngs=nnx.Rngs(1), scan_blocks=True, **CFG)

    sd = state_dict_from_module(loop)
    missing, unexpected = load_torch_state_dict(scan, sd)
    assert not missing and not unexpected, (missing, unexpected)

    inp = _input()
    ref = loop(inp).features
    out = scan(inp).features
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_croco_scan_export_roundtrip():
    "Exporting a scan-layout encoder produces loop-layout torch keys."
    scan = CroCoEncoder(rngs=nnx.Rngs(0), scan_blocks=True, **CFG)
    loop = CroCoEncoder(rngs=nnx.Rngs(1), **CFG)
    sd = state_dict_from_module(scan)
    assert "enc_blocks.0.attn.qkv.weight" in sd and "enc_blocks.3.mlp.fc2.weight" in sd
    missing, unexpected = load_torch_state_dict(loop, sd)
    assert not missing and not unexpected
    inp = _input(3)
    np.testing.assert_allclose(np.asarray(loop(inp).features), np.asarray(scan(inp).features), atol=2e-5, rtol=1e-5)


def test_croco_scan_ifr_matches_loop():
    kwargs = dict(indices=[1, 3], norm_intermediate=False, intermediates_only=False)
    loop = CroCoIntermediateFeatureReturner(rngs=nnx.Rngs(0), **CFG, **kwargs)
    scan = CroCoIntermediateFeatureReturner(rngs=nnx.Rngs(1), scan_blocks=True, **CFG, **kwargs)
    load_torch_state_dict(scan, state_dict_from_module(loop))

    inp = _input(7)
    final_l, inter_l = loop(inp)
    final_s, inter_s = scan(inp)
    np.testing.assert_allclose(np.asarray(final_s.features), np.asarray(final_l.features), atol=2e-5, rtol=1e-5)
    assert len(inter_l) == len(inter_s) == 2
    for a, b in zip(inter_l, inter_s):
        np.testing.assert_allclose(np.asarray(b.features), np.asarray(a.features), atol=2e-5, rtol=1e-5)


def test_mvcat_scan_matches_loop():
    from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput
    from uniception_tpu.models.info_sharing.cross_attention_transformer import (
        MultiViewCrossAttentionTransformer,
        MultiViewCrossAttentionTransformerIFR,
    )

    cfg = dict(name="t", input_embed_dim=48, num_views=3, depth=3, dim=32, num_heads=4)
    loop = MultiViewCrossAttentionTransformer(rngs=nnx.Rngs(0), **cfg)
    scan = MultiViewCrossAttentionTransformer(rngs=nnx.Rngs(1), scan_blocks=True, **cfg)
    missing, unexpected = load_torch_state_dict(scan, state_dict_from_module(loop))
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(2, 48, 4, 4).astype(np.float32)) for _ in range(3)]
    ref = loop(MultiViewTransformerInput(features=feats))
    out = scan(MultiViewTransformerInput(features=feats))
    for a, b in zip(ref.features, out.features):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-5)

    # IFR variant
    loop_i = MultiViewCrossAttentionTransformerIFR(rngs=nnx.Rngs(0), indices=[0, 2], norm_intermediate=False, **cfg)
    scan_i = MultiViewCrossAttentionTransformerIFR(
        rngs=nnx.Rngs(1), indices=[0, 2], norm_intermediate=False, scan_blocks=True, **cfg
    )
    load_torch_state_dict(scan_i, state_dict_from_module(loop_i))
    ref_f, ref_inter = loop_i(MultiViewTransformerInput(features=feats))
    out_f, out_inter = scan_i(MultiViewTransformerInput(features=feats))
    for a, b in zip(ref_f.features, out_f.features):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-5)
    assert len(ref_inter) == len(out_inter) == 2
    for ri, oi in zip(ref_inter, out_inter):
        for a, b in zip(ri.features, oi.features):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-5)


def test_dust3r_scan_matches_loop():
    from uniception_tpu.models.factory.dust3r import DUSt3R

    cfg = dict(
        name="d",
        img_size=(64, 64),
        enc_embed_dim=96,
        enc_depth=3,
        enc_num_heads=4,
        info_sharing_dim=64,
        info_sharing_depth=2,
        info_sharing_num_heads=4,
    )
    loop = DUSt3R(rngs=nnx.Rngs(0), **cfg)
    scan = DUSt3R(rngs=nnx.Rngs(1), scan_blocks=True, **cfg)
    missing, unexpected = load_torch_state_dict(scan, state_dict_from_module(loop))
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    img2 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    ref1, ref2 = loop.forward_pair(img1, img2)
    out1, out2 = scan.forward_pair(img1, img2)
    np.testing.assert_allclose(np.asarray(out1["pts3d"]), np.asarray(ref1["pts3d"]), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out2["pts3d_in_other_view"]), np.asarray(ref2["pts3d_in_other_view"]), atol=1e-4, rtol=1e-4
    )


def test_scan_remat_matches():
    cfg = dict(CFG, enc_depth=2)
    base = CroCoEncoder(rngs=nnx.Rngs(0), scan_blocks=True, **cfg)
    remat = CroCoEncoder(rngs=nnx.Rngs(1), scan_blocks=True, gradient_checkpointing=True, **cfg)
    load_torch_state_dict(remat, state_dict_from_module(base))
    inp = _input(5, b=1)
    np.testing.assert_allclose(np.asarray(remat(inp).features), np.asarray(base(inp).features), atol=1e-6)


def test_vit_trunk_scan_matches_loop():
    "DinoVisionTransformer scan layout: forward + intermediates + truncation."
    from uniception_tpu.models.encoders.vit import DinoVisionTransformer

    cfg = dict(img_size=28, patch_size=14, embed_dim=64, depth=4, num_heads=4, num_register_tokens=2)
    loop = DinoVisionTransformer(rngs=nnx.Rngs(0), **cfg)
    scan = DinoVisionTransformer(rngs=nnx.Rngs(1), scan_blocks=True, **cfg)
    missing, unexpected = load_torch_state_dict(scan, state_dict_from_module(loop))
    assert not missing and not unexpected, (missing, unexpected)

    img = jnp.asarray(np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32))
    ref_x, ref_col, _ = loop.forward_tokens(img, collect_indices=(1, 3))
    out_x, out_col, _ = scan.forward_tokens(img, collect_indices=(1, 3))
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x), atol=2e-5, rtol=1e-5)
    for i in (1, 3):
        np.testing.assert_allclose(np.asarray(out_col[i]), np.asarray(ref_col[i]), atol=2e-5, rtol=1e-5)

    # keep_first_n_layers-style truncation
    ref_t, _, _ = loop.forward_tokens(img, n_blocks=2)
    out_t, _, _ = scan.forward_tokens(img, n_blocks=2)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t), atol=2e-5, rtol=1e-5)


def test_global_attention_scan_matches_loop():
    from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput
    from uniception_tpu.models.info_sharing.global_attention_transformer import (
        MultiViewGlobalAttentionTransformer,
        MultiViewGlobalAttentionTransformerIFR,
    )

    cfg = dict(
        name="g", input_embed_dim=48, depth=4, dim=32, num_heads=4,
        distinguish_ref_and_non_ref_views=True, use_pe_for_non_reference_views=True,
        max_num_views_for_pe=8, use_rand_idx_pe_for_non_reference_views=False,
    )
    loop = MultiViewGlobalAttentionTransformer(rngs=nnx.Rngs(0), **cfg)
    scan = MultiViewGlobalAttentionTransformer(rngs=nnx.Rngs(1), scan_blocks=True, **cfg)
    missing, unexpected = load_torch_state_dict(scan, state_dict_from_module(loop))
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(2, 48, 4, 4).astype(np.float32)) for _ in range(3)]
    ref = loop(MultiViewTransformerInput(features=feats))
    out = scan(MultiViewTransformerInput(features=feats))
    for a, b in zip(ref.features, out.features):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-5)

    loop_i = MultiViewGlobalAttentionTransformerIFR(rngs=nnx.Rngs(0), indices=[1, 3], **cfg)
    scan_i = MultiViewGlobalAttentionTransformerIFR(rngs=nnx.Rngs(1), indices=[1, 3], scan_blocks=True, **cfg)
    load_torch_state_dict(scan_i, state_dict_from_module(loop_i))
    ref_f, ref_inter = loop_i(MultiViewTransformerInput(features=feats))
    out_f, out_inter = scan_i(MultiViewTransformerInput(features=feats))
    for ri, oi in zip(ref_inter, out_inter):
        for a, b in zip(ri.features, oi.features):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-5)


def test_alternating_attention_scan_matches_loop():
    from uniception_tpu.models.info_sharing.alternating_attention_transformer import (
        MultiViewAlternatingAttentionTransformer,
        MultiViewAlternatingAttentionTransformerIFR,
    )
    from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput

    cfg = dict(
        name="a", input_embed_dim=48, depth=4, dim=32, num_heads=4,
        use_rand_idx_pe_for_non_reference_views=False,
    )
    loop = MultiViewAlternatingAttentionTransformer(rngs=nnx.Rngs(0), **cfg)
    scan = MultiViewAlternatingAttentionTransformer(rngs=nnx.Rngs(1), scan_blocks=True, **cfg)
    missing, unexpected = load_torch_state_dict(scan, state_dict_from_module(loop))
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.randn(2, 48, 4, 4).astype(np.float32)) for _ in range(3)]
    ref = loop(MultiViewTransformerInput(features=feats))
    out = scan(MultiViewTransformerInput(features=feats))
    for a, b in zip(ref.features, out.features):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-5)

    loop_i = MultiViewAlternatingAttentionTransformerIFR(rngs=nnx.Rngs(0), indices=[0, 1, 3], **cfg)
    scan_i = MultiViewAlternatingAttentionTransformerIFR(rngs=nnx.Rngs(1), indices=[0, 1, 3], scan_blocks=True, **cfg)
    load_torch_state_dict(scan_i, state_dict_from_module(loop_i))
    ref_f, ref_inter = loop_i(MultiViewTransformerInput(features=feats))
    out_f, out_inter = scan_i(MultiViewTransformerInput(features=feats))
    assert len(ref_inter) == len(out_inter) == 3
    for ri, oi in zip(ref_inter, out_inter):
        for a, b in zip(ri.features, oi.features):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-5)
