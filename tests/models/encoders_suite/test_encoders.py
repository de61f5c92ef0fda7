"""
Parametrized encoder contract suite (reference analogue:
tests/models/encoders/test_encoders.py:22-209): every offline-constructible
registry configuration is built and checked for the base-class attribute
contract, the normalization-mismatch assertion, and the 14x14 feature grid
for a 14*patch-sized input.

Select one encoder with `pytest --encoder-name=<name>`.
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from uniception_tpu.models.encoders import ENCODER_CONFIGS, encoder_factory
from uniception_tpu.models.encoders.base import (
    UniCeptionEncoderBase,
    UniCeptionViTEncoderBase,
    ViTEncoderInput,
    ViTEncoderOutput,
)

# offline-constructible test configurations (small sizes; checkpoint-needing
# paths construct randomly initialized like the reference without ckpts)
ENCODER_TEST_CONFIGS = {
    "croco": dict(name="croco", data_norm_type="croco", patch_size=16, enc_embed_dim=64, enc_depth=2, enc_num_heads=4),
    "dinov2": dict(name="dinov2", data_norm_type="dinov2", size="small", keep_first_n_layers=2),
    "dinov2_registers": dict(
        _encoder="dinov2", name="dinov2", data_norm_type="dinov2", size="small", with_registers=True, keep_first_n_layers=2
    ),
    "dinov3": dict(name="dinov3", data_norm_type="dinov3", size="small", keep_first_n_layers=2),
    "dinov3_convnext": dict(name="dinov3_cnx", data_norm_type="dinov3", size="tiny"),
    "dune": dict(name="dune", data_norm_type="dune", vit_size="small", keep_first_n_layers=2),
    "radio": dict(name="radio", data_norm_type="radio", model_version="radio_v2.5-b", keep_first_n_layers=2),
    "eradio": dict(_encoder="radio", name="eradio", data_norm_type="radio", model_version="e-radio_v2", eradio_input_shape=(224, 224)),
    "perception_encoder": dict(
        name="pe", data_norm_type="perception_encoder", size="base", patch_size=16, checkpoint_type="core",
        keep_first_n_layers=-11,  # PE truncate semantics: keep through layer_idx
    ),
    "pixio": dict(name="pixio", data_norm_type="pixio", embed_dim=64, depth=2, num_heads=4),
    "cosmos": dict(name="cosmos", data_norm_type="cosmos", patch_size=8),
    "patch_embedder": dict(name="pe2", data_norm_type="patch_embedder", input_size=56, patch_size=14, enc_embed_dim=64),
}

_PATCH_GRID_SKIP = {"dinov3_convnext", "cosmos"}  # /32 and latent-grid encoders


def _configs(request):
    sel = request.config.getoption("--encoder-name")
    if sel:
        return {k: v for k, v in ENCODER_TEST_CONFIGS.items() if v.get("_encoder", k) == sel or k == sel}
    return ENCODER_TEST_CONFIGS


@pytest.fixture(params=sorted(ENCODER_TEST_CONFIGS))
def encoder_case(request):
    sel = request.config.getoption("--encoder-name")
    key = request.param
    cfg = dict(ENCODER_TEST_CONFIGS[key])
    encoder_name = cfg.pop("_encoder", key)
    if sel and encoder_name != sel and key != sel:
        pytest.skip(f"--encoder-name={sel}")
    return encoder_name, cfg


def test_all_encoder_basics(encoder_case):
    encoder_name, cfg = encoder_case
    enc = encoder_factory(encoder_name, rngs=nnx.Rngs(0), **cfg)

    # base-class attribute contract (reference :143-154)
    assert isinstance(enc, UniCeptionEncoderBase)
    for attr in ("name", "data_norm_type"):
        assert hasattr(enc, attr)
    if isinstance(enc, UniCeptionViTEncoderBase):
        assert hasattr(enc, "patch_size")

    # normalization-mismatch assertion (reference :156-170)
    with pytest.raises(AssertionError):
        enc._check_data_normalization_type("definitely_wrong_norm")


def test_vit_encoder_patch_grid(encoder_case):
    "A 14*patch-sized input must produce a 14x14 feature grid (reference :179-194)."
    encoder_name, cfg = encoder_case
    if encoder_name in _PATCH_GRID_SKIP or cfg["name"] in _PATCH_GRID_SKIP:
        pytest.skip("non-patch-grid encoder")
    enc = encoder_factory(encoder_name, rngs=nnx.Rngs(0), **cfg)
    if not isinstance(enc, UniCeptionViTEncoderBase):
        pytest.skip("not a ViT-style encoder")
    p = enc.patch_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 3, 14 * p, 14 * p).astype(np.float32))
    out = enc(ViTEncoderInput(image=img, data_norm_type=enc.data_norm_type))
    assert isinstance(out, ViTEncoderOutput)
    assert out.features.shape[-2:] == (14, 14), f"{encoder_name}: {out.features.shape}"
