"""
CroCo encoder: shape gates + full-encoder numeric parity vs the torch
reference (random-initialized torch weights copied into the nnx encoder).
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.encoders.base import ViTEncoderInput, ViTEncoderOutput
from uniception_tpu.models.encoders.croco import CroCoEncoder, CroCoIntermediateFeatureReturner
from uniception_tpu.utils.torch_compat import load_torch_state_dict

SMALL = dict(patch_size=16, enc_embed_dim=128, enc_depth=4, enc_num_heads=4)


def make_image(rng, B=2, H=64, W=64):
    return rng.randn(B, 3, H, W).astype(np.float32)


def test_croco_shapes_and_ifr():
    rng = np.random.RandomState(0)
    enc = CroCoEncoder(name="croco_small", data_norm_type="dust3r", img_size=(64, 64), rngs=nnx.Rngs(0), **SMALL)
    out = enc(ViTEncoderInput(image=jnp.asarray(make_image(rng)), data_norm_type="dust3r"))
    assert isinstance(out, ViTEncoderOutput)
    assert out.features.shape == (2, 128, 4, 4)

    ifr = CroCoIntermediateFeatureReturner(
        name="croco_small", data_norm_type="dust3r", img_size=(64, 64), indices=2, rngs=nnx.Rngs(0), **SMALL
    )
    outs = ifr(ViTEncoderInput(image=jnp.asarray(make_image(rng)), data_norm_type="dust3r"))
    assert isinstance(outs, list) and len(outs) == 2
    assert all(o.features.shape == (2, 128, 4, 4) for o in outs)

    ifr2 = CroCoIntermediateFeatureReturner(
        name="croco_small", data_norm_type="dust3r", img_size=(64, 64),
        indices=[-1], norm_intermediate=True, intermediates_only=False, rngs=nnx.Rngs(0), **SMALL,
    )
    final, inter = ifr2(ViTEncoderInput(image=jnp.asarray(make_image(rng)), data_norm_type="dust3r"))
    assert np.allclose(np.asarray(final.features), np.asarray(inter[0].features))


def test_croco_norm_type_mismatch_raises():
    enc = CroCoEncoder(name="croco_small", data_norm_type="dust3r", img_size=(64, 64), rngs=nnx.Rngs(0), **SMALL)
    with pytest.raises(AssertionError):
        enc(ViTEncoderInput(image=jnp.zeros((1, 3, 64, 64)), data_norm_type="croco"))


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
@pytest.mark.parametrize("patch_embed_cls", ["PatchEmbedDust3R", "ManyAR_PatchEmbed"])
def test_croco_parity_vs_reference(patch_embed_cls):
    add_reference_to_path()
    import torch
    from uniception.models.encoders.croco import CroCoEncoder as TorchCroCo

    torch.manual_seed(0)
    t_enc = TorchCroCo(
        name="croco_small", data_norm_type="dust3r", patch_embed_cls=patch_embed_cls, img_size=(64, 64), **SMALL
    )
    t_enc.eval()

    j_enc = CroCoEncoder(
        name="croco_small", data_norm_type="dust3r", patch_embed_cls=patch_embed_cls, img_size=(64, 64),
        rngs=nnx.Rngs(0), **SMALL,
    )
    sd = {k: v.detach().numpy() for k, v in t_enc.state_dict().items()}
    missing, unexpected = load_torch_state_dict(j_enc, sd)
    assert not missing and not unexpected

    rng = np.random.RandomState(1)
    img = make_image(rng)
    with torch.no_grad():
        t_out = t_enc(__import__("uniception.models.encoders.base", fromlist=["ViTEncoderInput"]).ViTEncoderInput(
            image=torch.from_numpy(img), data_norm_type="dust3r"
        )).features.numpy()
    j_out = np.asarray(j_enc(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="dust3r")).features)

    err = np.abs(t_out - j_out).max()
    assert err < 1e-4, f"max abs err {err}"


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_croco_manyar_portrait_parity():
    "ManyAR with a mixed landscape/portrait batch must match the reference scatter logic."
    add_reference_to_path()
    import torch
    from uniception.models.encoders.croco import CroCoEncoder as TorchCroCo

    torch.manual_seed(0)
    kwargs = dict(
        name="croco_small", data_norm_type="dust3r", patch_embed_cls="ManyAR_PatchEmbed", img_size=(64, 64), **SMALL
    )
    t_enc = TorchCroCo(**kwargs)
    t_enc.eval()
    j_enc = CroCoEncoder(rngs=nnx.Rngs(0), **kwargs)
    load_torch_state_dict(j_enc, {k: v.detach().numpy() for k, v in t_enc.state_dict().items()})

    rng = np.random.RandomState(2)
    img = make_image(rng, B=2, H=48, W=64)  # landscape frame
    true_shape = np.array([[48, 64], [64, 48]], dtype=np.int64)  # second sample is portrait

    from uniception.models.encoders.base import ViTEncoderInput as TorchViTIn

    t_in = TorchViTIn(image=torch.from_numpy(img), data_norm_type="dust3r")
    t_in.true_shape = torch.from_numpy(true_shape)
    with torch.no_grad():
        t_out = t_enc(t_in).features.numpy()

    j_out = np.asarray(
        j_enc(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="dust3r", true_shape=jnp.asarray(true_shape))).features
    )
    err = np.abs(t_out - j_out).max()
    assert err < 1e-4, f"max abs err {err}"
