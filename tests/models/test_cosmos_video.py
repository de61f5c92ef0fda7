"""
Cosmos causal-3D video tokenizer parity vs the torch reference: 3D haar
(un)patching, causal conv padding, factorized causal encoder/decoder.
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.libs.cosmos_tokenizer.modules.patching import Patcher3D, UnPatcher3D
from uniception_tpu.utils.torch_compat import load_torch_state_dict

pytestmark = pytest.mark.skipif(not has_reference(), reason="torch reference not available")
add_reference_to_path()

SMALL_CFG = dict(
    attn_resolutions=[8],
    channels=16,
    channels_mult=[2, 4],
    dropout=0.0,
    in_channels=3,
    num_res_blocks=1,
    out_channels=3,
    resolution=32,
    patch_size=2,
    patch_method="haar",
    spatial_compression=8,
    temporal_compression=4,
)


@pytest.mark.parametrize("method", ["haar", "rearrange"])
def test_patcher3d_parity(method):
    import torch
    from uniception.models.libs.cosmos_tokenizer.modules.patching import Patcher3D as TP
    from uniception.models.libs.cosmos_tokenizer.modules.patching import UnPatcher3D as TU

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 5, 8, 8).astype(np.float32)
    with torch.no_grad():
        t_p = TP(2, method)(torch.from_numpy(x)).numpy()
    j_p = np.asarray(Patcher3D(2, method)(jnp.asarray(x)))
    assert t_p.shape == j_p.shape
    assert np.abs(t_p - j_p).max() < 1e-5

    with torch.no_grad():
        t_u = TU(2, method)(torch.from_numpy(t_p)).numpy()
    j_u = np.asarray(UnPatcher3D(2, method)(jnp.asarray(j_p)))
    assert np.abs(t_u - j_u).max() < 1e-5


@pytest.mark.slow
def test_causal_encoder_decoder_base_parity():
    import torch
    from uniception.models.libs.cosmos_tokenizer.modules.layers3d import DecoderBase as TDec
    from uniception.models.libs.cosmos_tokenizer.modules.layers3d import EncoderBase as TEnc

    from uniception_tpu.models.libs.cosmos_tokenizer.modules.layers3d import DecoderBase, EncoderBase

    cfg = dict(SMALL_CFG, num_groups=4)
    cfg.pop("spatial_compression"), cfg.pop("temporal_compression")

    torch.manual_seed(0)
    t_enc = TEnc(z_channels=4, **cfg)
    t_enc.eval()
    j_enc = EncoderBase(z_channels=4, rngs=nnx.Rngs(0), **cfg)
    missing, _ = load_torch_state_dict(j_enc, {k: v.detach().numpy() for k, v in t_enc.state_dict().items()}, strict=True)
    assert not missing

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 5, 32, 32).astype(np.float32)
    with torch.no_grad():
        t_out = t_enc(torch.from_numpy(x)).numpy()
    j_out = np.asarray(j_enc(jnp.asarray(x)))
    assert t_out.shape == j_out.shape
    err = np.abs(t_out - j_out).max()
    assert err < 2e-4, f"encoder err {err}"

    torch.manual_seed(0)
    t_dec = TDec(z_channels=4, **cfg)
    t_dec.eval()
    j_dec = DecoderBase(z_channels=4, rngs=nnx.Rngs(0), **cfg)
    missing, _ = load_torch_state_dict(j_dec, {k: v.detach().numpy() for k, v in t_dec.state_dict().items()}, strict=True)
    assert not missing

    z = rng.randn(*t_out.shape).astype(np.float32)
    with torch.no_grad():
        t_img = t_dec(torch.from_numpy(z)).numpy()
    j_img = np.asarray(j_dec(jnp.asarray(z)))
    assert t_img.shape == j_img.shape
    err = np.abs(t_img - j_img).max()
    assert err < 2e-4, f"decoder err {err}"


def test_causal_encoder_decoder_factorized_parity():
    import torch
    from uniception.models.libs.cosmos_tokenizer.modules.layers3d import DecoderFactorized as TDec
    from uniception.models.libs.cosmos_tokenizer.modules.layers3d import EncoderFactorized as TEnc

    from uniception_tpu.models.libs.cosmos_tokenizer.modules.layers3d import DecoderFactorized, EncoderFactorized

    torch.manual_seed(0)
    t_enc = TEnc(z_channels=4, **SMALL_CFG)
    t_enc.eval()
    j_enc = EncoderFactorized(z_channels=4, rngs=nnx.Rngs(0), **SMALL_CFG)
    missing, _ = load_torch_state_dict(j_enc, {k: v.detach().numpy() for k, v in t_enc.state_dict().items()}, strict=True)
    assert not missing

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 5, 32, 32).astype(np.float32)
    with torch.no_grad():
        t_out = t_enc(torch.from_numpy(x)).numpy()
    j_out = np.asarray(j_enc(jnp.asarray(x)))
    assert t_out.shape == j_out.shape
    err = np.abs(t_out - j_out).max()
    assert err < 2e-4, f"encoder err {err}"

    torch.manual_seed(0)
    t_dec = TDec(z_channels=4, **SMALL_CFG)
    t_dec.eval()
    j_dec = DecoderFactorized(z_channels=4, rngs=nnx.Rngs(0), **SMALL_CFG)
    missing, _ = load_torch_state_dict(j_dec, {k: v.detach().numpy() for k, v in t_dec.state_dict().items()}, strict=True)
    assert not missing

    z = rng.randn(*t_out.shape).astype(np.float32)
    with torch.no_grad():
        t_img = t_dec(torch.from_numpy(z)).numpy()
    j_img = np.asarray(j_dec(jnp.asarray(z)))
    assert t_img.shape == j_img.shape
    err = np.abs(t_img - j_img).max()
    assert err < 2e-4, f"decoder err {err}"
