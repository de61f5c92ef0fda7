"""
Pixio encoder numeric parity vs the self-contained torch reference
(/root/reference/uniception/models/encoders/pixio.py:99-581 — no torch.hub,
so an offline oracle exists; this closes the last offline-testable gap).

The reference constructor unconditionally downloads weights from the HF hub
(pixio.py:496-503); the tests monkeypatch ``get_pth_file`` to a local empty
state dict, then randomize the torch parameters and copy them into the JAX
encoder via ``load_torch_state_dict``. Covers the native-size path, the
bicubic PE-interpolation path at a non-native size, and the 8-cls-token
stripping (features must exclude the cls tokens).
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.encoders.base import ViTEncoderInput
from uniception_tpu.models.encoders.pixio import PixioEncoder
from uniception_tpu.utils.torch_compat import load_torch_state_dict

SMALL = dict(
    img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4, mlp_ratio=4.0, n_cls_tokens=8
)


def _make_torch_pixio(tmp_path, monkeypatch, **cfg):
    add_reference_to_path()
    import torch
    from uniception.models.encoders.pixio import PixioEncoder as TorchPixio

    ckpt_path = tmp_path / "empty.pth"
    torch.save({}, ckpt_path)
    monkeypatch.setattr(TorchPixio, "get_pth_file", lambda self, repo_id: str(ckpt_path))

    torch.manual_seed(0)
    t_enc = TorchPixio(
        name="pixio", data_norm_type="pixio", gradient_checkpointing=False, **cfg
    )
    # the reference zero-inits cls_token/pos_embed and relies on real HF
    # weights; randomize everything so PE interpolation is numerically
    # exercised, not a zeros no-op
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in t_enc.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    return t_enc.eval()


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
@pytest.mark.parametrize("H,W", [(64, 64), (96, 80)])  # native grid 4x4; bicubic PE interp to 6x5
def test_pixio_parity_vs_reference(tmp_path, monkeypatch, H, W):
    import torch

    t_enc = _make_torch_pixio(tmp_path, monkeypatch, **SMALL)
    j_enc = PixioEncoder(name="pixio", data_norm_type="pixio", rngs=nnx.Rngs(0), **SMALL)
    load_torch_state_dict(j_enc, t_enc.state_dict())

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, H, W).astype(np.float32)

    with torch.no_grad():
        t_out = t_enc.forward(ViTEncoderInput(image=torch.from_numpy(img), data_norm_type="pixio"))
    j_out = j_enc(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="pixio"))

    t_feat = t_out.features.numpy()
    j_feat = np.asarray(j_out.features)
    assert j_feat.shape == t_feat.shape == (2, SMALL["embed_dim"], H // 16, W // 16)
    np.testing.assert_allclose(j_feat, t_feat, atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_pixio_cls_token_stripping(tmp_path, monkeypatch):
    """Features must be the 8-cls-stripped patch tokens: check against a
    manual torch forward that keeps the full token stream."""
    import torch

    t_enc = _make_torch_pixio(tmp_path, monkeypatch, **SMALL)
    j_enc = PixioEncoder(name="pixio", data_norm_type="pixio", rngs=nnx.Rngs(0), **SMALL)
    load_torch_state_dict(j_enc, t_enc.state_dict())

    rng = np.random.RandomState(1)
    img = rng.randn(1, 3, 64, 64).astype(np.float32)

    # manual reference forward keeping all tokens
    with torch.no_grad():
        timg = torch.from_numpy(img)
        pos = t_enc._interpolate_pos_emb(timg)
        x = t_enc.patch_embed(timg) + pos[:, t_enc.n_cls_tokens :]
        cls_tok = (t_enc.cls_token + pos[:, : t_enc.n_cls_tokens]).expand(x.shape[0], -1, -1)
        x = torch.cat((cls_tok, x), dim=1)
        for blk in t_enc.blocks:
            x = blk(x)
        full = t_enc.norm(x).numpy()

    j_out = j_enc(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="pixio"))
    j_feat = np.asarray(j_out.features)  # (B, C, hp, wp)
    # stripped: tokens [8:] reshaped to the patch grid
    expected = full[:, 8:].reshape(1, 4, 4, SMALL["embed_dim"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_feat, expected, atol=1e-4, rtol=1e-4)
    assert full.shape[1] == 16 + 8  # sanity: the stream really had cls tokens
