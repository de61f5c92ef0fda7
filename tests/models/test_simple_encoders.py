"""
PatchEmbedder / DenseRepresentationEncoder / GlobalRepresentationEncoder:
shape gates + numeric parity vs the torch reference, plus DINOv2 structural
tests (hub weights are unavailable offline; numeric parity for DINOv2 runs
via converted checkpoints when present).
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.encoders import encoder_factory, feature_returner_encoder_factory
from uniception_tpu.models.encoders.base import (
    EncoderGlobalRepInput,
    ViTEncoderInput,
    ViTEncoderNonImageInput,
)
from uniception_tpu.utils.torch_compat import load_torch_state_dict


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_patch_embedder_shapes():
    enc = encoder_factory("patch_embedder", name="pe", input_size=56, patch_size=14, enc_embed_dim=64, rngs=nnx.Rngs(0))
    rng = np.random.RandomState(0)
    out = enc(ViTEncoderInput(image=jnp.asarray(rng.randn(2, 3, 56, 56).astype(np.float32)), data_norm_type="patch_embedder"))
    assert out.features.shape == (2, 64, 4, 4)
    # non-square, interpolated PE
    out = enc(ViTEncoderNonImageInput(data=jnp.asarray(rng.randn(2, 3, 42, 70).astype(np.float32))))
    assert out.features.shape == (2, 64, 3, 5)


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_patch_embedder_parity():
    add_reference_to_path()
    import torch
    from uniception.models.encoders.base import ViTEncoderInput as TIn
    from uniception.models.encoders.patch_embedder import PatchEmbedder as TPE

    torch.manual_seed(0)
    kwargs = dict(name="pe", input_size=56, patch_size=14, enc_embed_dim=64)
    t = TPE(**kwargs)
    t.eval()
    j = encoder_factory("patch_embedder", rngs=nnx.Rngs(0), **kwargs)
    load_torch_state_dict(j, _sd(t))

    rng = np.random.RandomState(1)
    for h, w in [(56, 56), (42, 70)]:
        img = rng.randn(2, 3, h, w).astype(np.float32)
        with torch.no_grad():
            t_out = t(TIn(image=torch.from_numpy(img), data_norm_type="patch_embedder")).features.numpy()
        j_out = np.asarray(j(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="patch_embedder")).features)
        err = np.abs(t_out - j_out).max()
        assert err < 1e-4, f"({h},{w}): {err}"


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_dense_rep_encoder_parity():
    add_reference_to_path()
    import torch
    from uniception.models.encoders.base import ViTEncoderNonImageInput as TIn
    from uniception.models.encoders.dense_rep_encoder import DenseRepresentationEncoder as TDRE

    torch.manual_seed(0)
    kwargs = dict(
        name="dre", data_norm_type="dense_rep_encoder", in_chans=2, enc_embed_dim=64,
        intermediate_dims=[32, 48], input_size_for_pe=56, patch_size=14, apply_pe=True,
    )
    t = TDRE(**kwargs)
    t.eval()
    j = encoder_factory("dense_rep_encoder", rngs=nnx.Rngs(0), **kwargs)
    load_torch_state_dict(j, {k: v for k, v in _sd(t).items() if k != "pos_embed"})

    rng = np.random.RandomState(2)
    for h, w in [(56, 56), (28, 70)]:
        data = rng.randn(2, 2, h, w).astype(np.float32)
        with torch.no_grad():
            t_out = t(TIn(data=torch.from_numpy(data))).features.numpy()
        j_out = np.asarray(j(ViTEncoderNonImageInput(data=jnp.asarray(data))).features)
        err = np.abs(t_out - j_out).max()
        assert err < 1e-4, f"({h},{w}): {err}"


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_global_rep_encoder_parity():
    add_reference_to_path()
    import torch
    from uniception.models.encoders.base import EncoderGlobalRepInput as TIn
    from uniception.models.encoders.global_rep_encoder import GlobalRepresentationEncoder as TGRE

    torch.manual_seed(0)
    kwargs = dict(name="gre", in_chans=5, enc_embed_dim=64, intermediate_dims=[16, 32, 48])
    t = TGRE(**kwargs)
    t.eval()
    j = encoder_factory("global_rep_encoder", rngs=nnx.Rngs(0), **kwargs)
    missing, unexpected = load_torch_state_dict(j, _sd(t))
    assert not missing and not unexpected

    rng = np.random.RandomState(3)
    data = rng.randn(4, 5).astype(np.float32)
    with torch.no_grad():
        t_out = t(TIn(data=torch.from_numpy(data))).features.numpy()
    j_out = np.asarray(j(EncoderGlobalRepInput(data=jnp.asarray(data))).features)
    assert np.abs(t_out - j_out).max() < 1e-5


def test_dinov2_structural():
    "Self-contained DINOv2: shapes, registers, IFR (hub parity needs weights)."
    enc = encoder_factory(
        "dinov2", name="dinov2", size="small", with_registers=True, keep_first_n_layers=2, rngs=nnx.Rngs(0)
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 3, 56, 70).astype(np.float32))
    out = enc(ViTEncoderInput(image=img, data_norm_type="dinov2"))
    assert out.features.shape == (2, 384, 4, 5)
    assert out.registers.shape == (2, 384, 5)  # cls + 4 registers

    ifr = feature_returner_encoder_factory(
        "dinov2", name="dinov2", size="small", keep_first_n_layers=4, indices=[0, 3], rngs=nnx.Rngs(0)
    )
    outs = ifr(ViTEncoderInput(image=img, data_norm_type="dinov2"))
    assert len(outs) == 2 and all(o.features.shape == (2, 384, 4, 5) for o in outs)


def test_make_encoder_test_configs():
    "Canonical test-factory strings construct offline (no checkpoints present)."
    from flax import nnx

    from uniception_tpu.models.encoders import _make_encoder_test

    e = _make_encoder_test("dummy")
    assert e.name == "dummy"
    enc = _make_encoder_test("croco", rngs=nnx.Rngs(0), enc_embed_dim=64, enc_depth=1, enc_num_heads=4)
    assert type(enc).__name__ == "CroCoEncoder"
    pe = _make_encoder_test("patch_embedder", rngs=nnx.Rngs(0))
    assert pe.name == "patch_embedder"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _make_encoder_test("not_an_encoder")
