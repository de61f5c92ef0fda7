"""
Perception Encoder ViT parity vs the reference's vendored torch
implementation (small config, random weights copied across) — covers the
interleaved-pair axial RoPE2D, packed in_proj attention, LayerScale,
PE interpolation and attention pooling.
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.libs.perception_encoder.pe import VisionTransformer
from uniception_tpu.utils.torch_compat import load_torch_state_dict

pytestmark = pytest.mark.skipif(not has_reference(), reason="torch reference not available")
add_reference_to_path()

SMALL = dict(
    patch_size=14,
    width=64,
    layers=3,
    heads=4,
    mlp_ratio=2.0,
    image_size=56,
    use_cls_token=True,
    use_rope2d=True,
    use_abs_posemb=True,
    ls_init_value=0.1,
    output_dim=32,
    pool_type="attn",
)


def make_models():
    import torch
    from uniception.models.libs.perception_encoder.vision_encoder.pe import VisionTransformer as TViT

    torch.manual_seed(0)
    t = TViT(**SMALL)
    t.eval()
    j = VisionTransformer(rngs=nnx.Rngs(0), **SMALL)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    # the torch RotaryEmbedding registers a learned-freq buffer we recompute
    sd = {k: v for k, v in sd.items() if "rope" not in k and "dummy" not in k and "freqs" not in k}
    missing, unexpected = load_torch_state_dict(j, sd, strict=True)
    assert not missing, missing
    return t, j


def test_pe_forward_features_parity():
    import torch

    t, j = make_models()
    rng = np.random.RandomState(0)
    for h, w in [(56, 56), (42, 70)]:
        img = rng.randn(2, 3, h, w).astype(np.float32)
        with torch.no_grad():
            t_out = t.forward_features(torch.from_numpy(img), norm=True, strip_cls_token=True).numpy()
        j_out = np.asarray(j.forward_features(jnp.asarray(img), norm=True, strip_cls_token=True))
        err = np.abs(t_out - j_out).max()
        assert err < 5e-5, f"({h},{w}): {err}"


def test_pe_full_forward_with_pooling_parity():
    import torch

    t, j = make_models()
    rng = np.random.RandomState(1)
    img = rng.randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        t_out = t(torch.from_numpy(img)).numpy()
    j_out = np.asarray(j(jnp.asarray(img)))
    err = np.abs(t_out - j_out).max()
    assert err < 5e-5, f"{err}"


def test_pe_intermediate_layers_parity():
    import torch

    t, j = make_models()
    rng = np.random.RandomState(2)
    img = rng.randn(1, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        t_outs = t.get_intermediate_layers(torch.from_numpy(img), n=[0, 2], norm=True, strip_cls_token=True)
    j_outs = j.get_intermediate_layers(jnp.asarray(img), n=[0, 2], norm=True, strip_cls_token=True)
    assert len(t_outs) == len(j_outs) == 2
    for t_o, j_o in zip(t_outs, j_outs):
        assert np.abs(t_o.numpy() - np.asarray(j_o)).max() < 5e-5


def _fill_params_deterministic(t_mod):
    "torch TextTransformer uses torch.empty for some params; fill all deterministically."
    import torch

    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in t_mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)


@pytest.mark.parametrize("pool_type", ["argmax", "first", "last"])
def test_pe_text_transformer_parity(pool_type):
    import torch
    from uniception.models.libs.perception_encoder.vision_encoder.pe import TextTransformer as TText

    from uniception_tpu.models.libs.perception_encoder.pe import TextTransformer

    cfg = dict(context_length=16, vocab_size=100, width=64, heads=4, layers=3, output_dim=32, pool_type=pool_type)
    torch.manual_seed(0)
    t_mod = TText(**cfg)
    t_mod.eval()
    _fill_params_deterministic(t_mod)
    j_mod = TextTransformer(rngs=nnx.Rngs(0), **cfg)
    sd = {k: v.detach().numpy() for k, v in t_mod.state_dict().items()}
    missing, _ = load_torch_state_dict(j_mod, sd, strict=True)
    assert not missing

    rng = np.random.RandomState(0)
    text = rng.randint(1, 100, size=(2, 16)).astype(np.int64)
    with torch.no_grad():
        t_out = t_mod(torch.from_numpy(text)).numpy()
    j_out = np.asarray(j_mod(jnp.asarray(text)))
    assert t_out.shape == j_out.shape
    err = np.abs(t_out - j_out).max()
    assert err < 5e-5, f"{pool_type}: {err}"


def test_pe_clip_parity():
    import torch
    from uniception.models.libs.perception_encoder.vision_encoder.config import PEConfig as TVCfg
    from uniception.models.libs.perception_encoder.vision_encoder.config import PETextConfig as TTCfg
    from uniception.models.libs.perception_encoder.vision_encoder.pe import CLIP as TCLIP

    from uniception_tpu.models.libs.perception_encoder.pe import CLIP, PEConfig, PETextConfig

    vcfg = dict(SMALL)
    tcfg = dict(context_length=16, vocab_size=100, width=48, heads=4, layers=2, output_dim=32)
    torch.manual_seed(0)
    t_mod = TCLIP(TVCfg(**vcfg), TTCfg(**tcfg))
    t_mod.eval()
    _fill_params_deterministic(t_mod)
    j_mod = CLIP(PEConfig(**vcfg), PETextConfig(**tcfg), rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in t_mod.state_dict().items()}
    missing, _ = load_torch_state_dict(j_mod, sd, strict=True)
    assert not missing

    rng = np.random.RandomState(1)
    img = rng.randn(2, 3, 56, 56).astype(np.float32)
    text = rng.randint(1, 100, size=(2, 16)).astype(np.int64)
    with torch.no_grad():
        t_img, t_txt, t_scale = t_mod(torch.from_numpy(img), torch.from_numpy(text))
    j_img, j_txt, j_scale = j_mod(jnp.asarray(img), jnp.asarray(text))
    assert np.abs(t_img.numpy() - np.asarray(j_img)).max() < 5e-5
    assert np.abs(t_txt.numpy() - np.asarray(j_txt)).max() < 5e-5
    assert abs(float(t_scale) - float(j_scale)) < 1e-5


@pytest.mark.parametrize("mask", [None, "causal"])
@pytest.mark.parametrize("n_kv_heads", [4, 2])
def test_pe_llama_transformer_parity(mask, n_kv_heads):
    import torch
    from uniception.models.libs.perception_encoder.transformer import BaseTransformer as TBase
    from uniception.models.libs.perception_encoder.transformer import BaseTransformerArgs as TArgs

    from uniception_tpu.models.libs.perception_encoder.transformer import BaseTransformer, BaseTransformerArgs

    kw = dict(dim=64, n_layers=2, n_heads=4, n_kv_heads=n_kv_heads, max_seqlen=16, multiple_of=8)
    torch.manual_seed(0)
    t_mod = TBase(TArgs(**kw))
    t_mod.init_weights()  # materializes the rotary buffer + param init
    t_mod.eval()
    j_mod = BaseTransformer(BaseTransformerArgs(**kw), rngs=nnx.Rngs(0))
    sd = {k: v.detach().numpy() for k, v in t_mod.state_dict().items()}
    missing, _ = load_torch_state_dict(j_mod, sd, strict=True)
    assert not missing

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 64).astype(np.float32)
    with torch.no_grad():
        t_out = t_mod(torch.from_numpy(x), mask=mask).numpy()
    j_out = np.asarray(j_mod(jnp.asarray(x), mask=mask))
    assert t_out.shape == j_out.shape
    err = np.abs(t_out - j_out).max()
    assert err < 5e-5, f"mask={mask} kv={n_kv_heads}: {err}"


def test_pe_llama_rope_long_context_scaling():
    import torch
    from uniception.models.libs.perception_encoder.transformer import RotaryEmbedding as TRope

    from uniception_tpu.models.libs.perception_encoder.transformer import RotaryEmbedding

    t_rope = TRope(theta=10000.0, head_dim=32, max_seqlen=64, scale_factor=8, low_freq_factor=1, high_freq_factor=4, old_context_len=128)
    t_rope.reset_parameters()
    t_fc = t_rope(seqlen=64).numpy()  # (S, D/2, 2, 2)
    j_rope = RotaryEmbedding(theta=10000.0, head_dim=32, max_seqlen=64, scale_factor=8, low_freq_factor=1, high_freq_factor=4, old_context_len=128)
    cos, sin = j_rope(seqlen=64)
    assert np.abs(t_fc[..., 0, 0] - np.asarray(cos)).max() < 1e-5
    assert np.abs(t_fc[..., 1, 0] - np.asarray(sin)).max() < 1e-5
