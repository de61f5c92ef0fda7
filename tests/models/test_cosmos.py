"""
Cosmos tokenizer parity vs the torch reference: haar (un)patching
(bit-exact block butterflies vs the reference's grouped wavelet convs),
2D encoder/decoder pyramids, FSQ quantizer, and the Cosmos encoder/head
wiring (structural).
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.libs.cosmos_tokenizer.modules.patching import Patcher, UnPatcher
from uniception_tpu.models.libs.cosmos_tokenizer.modules.quantizers import FSQuantizer
from uniception_tpu.utils.torch_compat import load_torch_state_dict

pytestmark = pytest.mark.skipif(not has_reference(), reason="torch reference not available")
add_reference_to_path()

SMALL_CFG = dict(
    attn_resolutions=[16],
    channels=32,
    channels_mult=[2, 4],
    dropout=0.0,
    in_channels=3,
    spatial_compression=8,
    num_res_blocks=1,
    out_channels=3,
    resolution=64,
    patch_size=4,
    patch_method="haar",
)


@pytest.mark.parametrize("method", ["haar", "rearrange"])
@pytest.mark.parametrize("patch_size", [2, 4])
def test_patcher_parity(method, patch_size):
    import torch
    from uniception.models.libs.cosmos_tokenizer.modules.patching import Patcher as TPatcher
    from uniception.models.libs.cosmos_tokenizer.modules.patching import UnPatcher as TUnPatcher

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        t_patched = TPatcher(patch_size, method)(torch.from_numpy(x)).numpy()
    j_patched = np.asarray(Patcher(patch_size, method)(jnp.asarray(x)))
    assert np.abs(t_patched - j_patched).max() < 1e-5

    with torch.no_grad():
        t_un = TUnPatcher(patch_size, method)(torch.from_numpy(t_patched)).numpy()
    j_un = np.asarray(UnPatcher(patch_size, method)(jnp.asarray(j_patched)))
    assert np.abs(t_un - j_un).max() < 1e-5
    assert np.abs(j_un - x).max() < 1e-5  # round trip


def test_cosmos_encoder_decoder_parity():
    import torch
    from uniception.models.libs.cosmos_tokenizer.modules.layers2d import Decoder as TDecoder
    from uniception.models.libs.cosmos_tokenizer.modules.layers2d import Encoder as TEncoder

    from uniception_tpu.models.libs.cosmos_tokenizer.modules.layers2d import Decoder, Encoder

    torch.manual_seed(0)
    t_enc = TEncoder(z_channels=8, **SMALL_CFG)
    t_enc.eval()
    j_enc = Encoder(z_channels=8, rngs=nnx.Rngs(0), **SMALL_CFG)
    missing, _ = load_torch_state_dict(j_enc, {k: v.detach().numpy() for k, v in t_enc.state_dict().items()}, strict=True)
    assert not missing

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_out = t_enc(torch.from_numpy(x)).numpy()
    j_out = np.asarray(j_enc(jnp.asarray(x)))
    assert t_out.shape == j_out.shape == (1, 8, 8, 8)
    err = np.abs(t_out - j_out).max()
    assert err < 1e-4, f"encoder err {err}"

    t_dec = TDecoder(z_channels=8, **SMALL_CFG)
    t_dec.eval()
    j_dec = Decoder(z_channels=8, rngs=nnx.Rngs(0), **SMALL_CFG)
    missing, _ = load_torch_state_dict(j_dec, {k: v.detach().numpy() for k, v in t_dec.state_dict().items()}, strict=True)
    assert not missing

    z = rng.randn(1, 8, 8, 8).astype(np.float32)
    with torch.no_grad():
        t_img = t_dec(torch.from_numpy(z)).numpy()
    j_img = np.asarray(j_dec(jnp.asarray(z)))
    assert t_img.shape == j_img.shape == (1, 3, 64, 64)
    err = np.abs(t_img - j_img).max()
    assert err < 1e-4, f"decoder err {err}"


def test_fsq_parity():
    import torch
    from uniception.models.libs.cosmos_tokenizer.modules.quantizers import FSQuantizer as TFSQ

    levels = [8, 8, 8, 5, 5, 5]
    t = TFSQ(levels=levels, dtype=torch.float32)
    j = FSQuantizer(levels=levels)
    rng = np.random.RandomState(2)
    z = rng.randn(2, 6, 4, 4).astype(np.float32)
    with torch.no_grad():
        t_idx, t_codes, _ = t(torch.from_numpy(z))
    j_idx, j_codes, _ = j(jnp.asarray(z))
    assert np.array_equal(t_idx.numpy(), np.asarray(j_idx))
    assert np.abs(t_codes.float().numpy() - np.asarray(j_codes)).max() < 1e-5
    # indices -> codes round trip
    j_rt = np.asarray(j.indices_to_codes(j_idx))
    t_rt = t.indices_to_codes(t_idx).float().numpy()
    assert np.abs(j_rt - t_rt).max() < 1e-5
