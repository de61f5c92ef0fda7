"""
Numeric oracles for the torch.hub-wrapped encoders: DINOv2 (with and
without registers), DUNE, DINOv3-ViT, DINOv3-ConvNeXt, and RADIO's
plain-ViT trunk (only E-RADIO — a hub-external hybrid — stays oracle-less).

The reference wraps torch.hub trunks (uniception/models/encoders/
dinov2.py:90-102, dune.py:87-118, dinov3.py:85-98), so no in-repo torch
implementation exists to compare against. Following the pixio pattern
(tests/models/test_pixio.py), the oracles here are hand-written
self-contained torch trunks built from the reference's OWN
transformer_blocks (SelfAttentionBlock/Mlp/LayerScale — the very modules
the hub architectures are made of, and the modules nn/blocks.py is
already parity-gated against) plus the hub-semantics glue: conv
patchifier, cls/register/storage tokens, bicubic PE interpolation with
the DINOv2 0.1-offset trick (row-major (h0, w0) grid), and — for DINOv3
— axial RoPE on q/k of the patch tokens only (reference croco
pos_embed.RoPE2D, the torch fallback the CUDA kernel matches).

Covers: feature parity <= 1e-4 at native and PE-interpolated sizes,
register handling, keep_first_n_layers truncation, mask_token deletion on
checkpoint load, and the DUNE 'encoder.* / blocks.M.N' checkpoint-key
remap round-trip (dune.py:172-223 semantics).
"""

import numpy as np
import pytest

# importorskip (not a bare import): collection must SKIP without torch,
# matching the has_reference guard — a bare ImportError at collection
# would take the whole default tier down on torch-less environments
torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.encoders.base import ViTEncoderInput

pytestmark = pytest.mark.skipif(not has_reference(), reason="torch reference not available")

torch.set_float32_matmul_precision("highest")


# ---------------------------------------------------------------------------
# torch oracle trunks
# ---------------------------------------------------------------------------


def _ref_blocks():
    add_reference_to_path()
    from uniception.models.utils import transformer_blocks as tb

    return tb


class TorchDinoViT(nn.Module):
    "DINOv2-style trunk: conv patchify, cls(+register) tokens, PE interp, pre-norm blocks."

    def __init__(self, img_size=518, patch_size=14, embed_dim=64, depth=2, num_heads=4,
                 num_register_tokens=0, interpolate_offset=0.1, init_values=1.0):
        super().__init__()
        tb = _ref_blocks()
        from functools import partial

        self.patch_size = patch_size
        self.num_register_tokens = num_register_tokens
        self.interpolate_offset = interpolate_offset
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed_dim, patch_size, stride=patch_size)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        n = (img_size // patch_size) ** 2
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, embed_dim))
        if num_register_tokens:
            self.register_tokens = nn.Parameter(torch.zeros(1, num_register_tokens, embed_dim))
        self.blocks = nn.ModuleList([
            tb.SelfAttentionBlock(
                dim=embed_dim, num_heads=num_heads, mlp_ratio=4.0, qkv_bias=True,
                init_values=init_values, norm_layer=partial(nn.LayerNorm, eps=1e-6),
            )
            for _ in range(depth)
        ])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)

    def _interp_pe(self, h0, w0):
        pe = self.pos_embed.float()
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
        n = patch_pe.shape[1]
        m = int(n ** 0.5)
        if (h0, w0) == (m, m):
            return cls_pe, patch_pe
        dim = patch_pe.shape[-1]
        grid = patch_pe.reshape(1, m, m, dim).permute(0, 3, 1, 2)
        if self.interpolate_offset:
            sh = float(h0 + self.interpolate_offset) / m
            sw = float(w0 + self.interpolate_offset) / m
            out = F.interpolate(grid, scale_factor=(sh, sw), mode="bicubic", align_corners=False)
        else:
            out = F.interpolate(grid, size=(h0, w0), mode="bicubic", align_corners=False)
        assert out.shape[-2:] == (h0, w0)
        return cls_pe, out.permute(0, 2, 3, 1).reshape(1, h0 * w0, dim)

    def forward_features(self, img):
        B, _, H, W = img.shape
        h0, w0 = H // self.patch_size, W // self.patch_size
        x = self.patch_embed.proj(img).flatten(2).transpose(1, 2)  # (B, N, D)
        cls_pe, patch_pe = self._interp_pe(h0, w0)
        cls_tok = (self.cls_token + cls_pe).expand(B, -1, -1)
        x = x + patch_pe
        toks = [cls_tok]
        if self.num_register_tokens:
            toks.append(self.register_tokens.expand(B, -1, -1))
        toks.append(x)
        x = torch.cat(toks, 1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        r = self.num_register_tokens
        return {
            "x_norm_clstoken": x[:, 0],
            "x_norm_regtokens": x[:, 1 : 1 + r],
            "x_norm_patchtokens": x[:, 1 + r :],
        }


class TorchDinoV3ViT(nn.Module):
    "DINOv3-style trunk: no patch PE; axial RoPE on q/k of patch tokens; cls + storage tokens."

    def __init__(self, patch_size=16, embed_dim=64, depth=2, num_heads=4, n_storage_tokens=4):
        super().__init__()
        tb = _ref_blocks()
        from functools import partial

        from uniception.models.libs.croco.pos_embed import RoPE2D

        self.patch_size = patch_size
        self.n_storage_tokens = n_storage_tokens
        self.rope = RoPE2D(freq=100.0)
        self.patch_embed = nn.Conv2d(3, embed_dim, patch_size, stride=patch_size)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.storage_tokens = nn.Parameter(torch.zeros(1, n_storage_tokens, embed_dim))

        def rope_with_prefix(tokens_bhnd, pos):
            # reference Attention hook convention: (B, H, N, D); rotate
            # patch tokens only, cls/storage stay unrotated
            p = 1 + n_storage_tokens
            prefix, patches = tokens_bhnd[:, :, :p], tokens_bhnd[:, :, p:]
            return torch.cat([prefix, self.rope(patches, pos)], dim=2)

        self.blocks = nn.ModuleList([
            tb.SelfAttentionBlock(
                dim=embed_dim, num_heads=num_heads, mlp_ratio=4.0, qkv_bias=True,
                init_values=1.0, norm_layer=partial(nn.LayerNorm, eps=1e-5),
                custom_positional_encoding=rope_with_prefix,
            )
            for _ in range(depth)
        ])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-5)

    def forward_features(self, img):
        B, _, H, W = img.shape
        hp, wp = H // self.patch_size, W // self.patch_size
        x = self.patch_embed(img).flatten(2).transpose(1, 2)
        prefix = torch.cat(
            [self.cls_token.expand(B, -1, -1), self.storage_tokens.expand(B, -1, -1)], 1
        )
        x = torch.cat([prefix, x], 1)
        ys, xs = torch.meshgrid(torch.arange(hp), torch.arange(wp), indexing="ij")
        pos = torch.stack([ys.reshape(-1), xs.reshape(-1)], -1)[None].expand(B, -1, -1).long()
        for blk in self.blocks:
            x = blk(x, pos)
        x = self.norm(x)
        r = self.n_storage_tokens
        return {"x_norm_clstoken": x[:, 0], "x_norm_patchtokens": x[:, 1 + r :]}


def _randomize(module, seed=1):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    return module.eval()


# ---------------------------------------------------------------------------
# DINOv2 trunk (DinoVisionTransformer) — tiny dims, with/without registers,
# native and interpolated PE
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("registers", [0, 4])
@pytest.mark.parametrize("H,W", [(56, 56), (84, 70)])
def test_dinov2_trunk_parity(registers, H, W):
    from uniception_tpu.models.encoders.vit import DinoVisionTransformer
    from uniception_tpu.utils.torch_compat import load_torch_state_dict

    t = _randomize(TorchDinoViT(img_size=56, embed_dim=64, depth=2, num_heads=4,
                                num_register_tokens=registers))
    j = DinoVisionTransformer(img_size=56, patch_size=14, embed_dim=64, depth=2,
                              num_heads=4, num_register_tokens=registers, rngs=nnx.Rngs(0))
    load_torch_state_dict(j, t.state_dict())

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, H, W).astype(np.float32)
    with torch.no_grad():
        t_out = t.forward_features(torch.from_numpy(img))
    j_out = j.forward_features(jnp.asarray(img))

    for key in ["x_norm_clstoken", "x_norm_patchtokens"] + (
        ["x_norm_regtokens"] if registers else []
    ):
        np.testing.assert_allclose(
            np.asarray(j_out[key]), t_out[key].numpy(), atol=1e-4, rtol=1e-4, err_msg=key
        )


# ---------------------------------------------------------------------------
# DINOv2Encoder wrapper — real ViT-S dims, keep_first_n_layers, registers,
# mask_token deletion through the checkpoint path
# ---------------------------------------------------------------------------


class _TorchDINOv2Wrapper(nn.Module):
    "Holds the trunk under .model like the reference encoder (checkpoint key parity)."

    def __init__(self, trunk):
        super().__init__()
        self.model = trunk


def test_dinov2_encoder_parity_keep_first_n_layers(tmp_path):
    """DINOv2Encoder at real ViT-S dims with keep_first_n_layers=2 +
    registers, loaded through pretrained_checkpoint_path with a mask_token
    key present (must be deleted, dinov2.py:104 semantics)."""
    from uniception_tpu.models.encoders.dinov2 import DINOv2Encoder
    from uniception_tpu.utils.checkpoint import save_checkpoint

    t = _TorchDINOv2Wrapper(
        _randomize(TorchDinoViT(img_size=518, embed_dim=384, depth=2, num_heads=6,
                                num_register_tokens=4))
    )
    sd = {k: v.numpy() for k, v in t.state_dict().items()}
    sd["model.mask_token"] = np.zeros((1, 384), np.float32)  # must be dropped
    ckpt = str(tmp_path / "dinov2.npz")
    save_checkpoint(ckpt, sd)

    j = DINOv2Encoder(
        name="dinov2", size="small", with_registers=True, keep_first_n_layers=2,
        pretrained_checkpoint_path=ckpt, rngs=nnx.Rngs(0),
    )

    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 70, 56).astype(np.float32)  # 5x4 grid: PE interp path
    with torch.no_grad():
        t_out = t.model.forward_features(torch.from_numpy(img))
    j_out = j(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="dinov2"))

    feats = np.asarray(j_out.features)
    assert feats.shape == (1, 384, 5, 4)
    expected = t_out["x_norm_patchtokens"].numpy().reshape(1, 5, 4, 384).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(feats, expected, atol=1e-4, rtol=1e-4)
    # registers output: cls + 4 register tokens, (B, D, 5)
    regs = np.asarray(j_out.registers)
    assert regs.shape == (1, 384, 5)
    np.testing.assert_allclose(regs[:, :, 0], t_out["x_norm_clstoken"].numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        regs[:, :, 1:].transpose(0, 2, 1), t_out["x_norm_regtokens"].numpy(), atol=1e-4, rtol=1e-4
    )


def test_dinov2_intermediate_returner_parity():
    "IFR variant: per-layer pre-norm tokens, normed, vs a manual torch collect."
    from uniception_tpu.models.encoders.dinov2 import DINOv2IntermediateFeatureReturner
    from uniception_tpu.utils.torch_compat import load_torch_state_dict

    t = _TorchDINOv2Wrapper(
        _randomize(TorchDinoViT(img_size=518, embed_dim=384, depth=3, num_heads=6))
    )
    j = DINOv2IntermediateFeatureReturner(
        name="dinov2", size="small", keep_first_n_layers=3, indices=[0, 2], rngs=nnx.Rngs(0)
    )
    load_torch_state_dict(j, t.state_dict())

    rng = np.random.RandomState(2)
    img = rng.randn(1, 3, 56, 56).astype(np.float32)

    with torch.no_grad():
        timg = torch.from_numpy(img)
        cls_pe, patch_pe = t.model._interp_pe(4, 4)
        x = t.model.patch_embed.proj(timg).flatten(2).transpose(1, 2) + patch_pe
        x = torch.cat([(t.model.cls_token + cls_pe).expand(1, -1, -1), x], 1)
        collected = {}
        for i, blk in enumerate(t.model.blocks):
            x = blk(x)
            collected[i] = t.model.norm(x)[:, 1:]  # normed patch tokens

    outs = j(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="dinov2"))
    assert len(outs) == 2
    for out, i in zip(outs, [0, 2]):
        expected = collected[i].numpy().reshape(1, 4, 4, 384).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(np.asarray(out.features), expected, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# DUNE — 448 PE table + the encoder.*/blocks.M.N checkpoint remap
# ---------------------------------------------------------------------------


def test_dune_encoder_parity_and_ckpt_remap(tmp_path):
    """DUNEEncoder vs the torch oracle with the 448-sized PE table
    (dune.py:108-113), loaded from a DUNE-layout checkpoint: 'encoder.'
    prefix, chunked 'blocks.0.N' keys, junk projector/teacher keys, and a
    mask_token that must be dropped (dune.py:172-223)."""
    from uniception_tpu.models.encoders.dune import DUNEEncoder
    from uniception_tpu.utils.checkpoint import save_checkpoint

    # oracle: DINOv2-reg trunk with PE table for pe_image_size=448 (32x32 grid)
    t = _randomize(TorchDinoViT(img_size=448, embed_dim=384, depth=2, num_heads=6,
                                num_register_tokens=4), seed=3)

    # build the DUNE checkpoint layout from the oracle's state dict
    sd = {}
    for k, v in t.state_dict().items():
        if k.startswith("blocks."):
            _, idx, rest = k.split(".", 2)
            k = f"blocks.0.{idx}.{rest}"  # chunked ModuleList layout
        sd["encoder." + k] = v.numpy()
    sd["encoder.mask_token"] = np.zeros((1, 384), np.float32)
    sd["projectors.0.weight"] = np.zeros((4, 4), np.float32)  # must be skipped
    sd["teacher_norms.0.weight"] = np.zeros((4,), np.float32)
    ckpt = str(tmp_path / "dune.pth.npz")
    save_checkpoint(ckpt, sd)

    j = DUNEEncoder(
        name="dune", vit_size="small", keep_first_n_layers=2,
        pretrained_checkpoint_path=ckpt, rngs=nnx.Rngs(0),
    )
    assert j.model.pos_embed[...].shape == (1, 32 * 32 + 1, 384)

    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 56, 70).astype(np.float32)  # 4x5 grid: interp from 32x32
    with torch.no_grad():
        t_out = t.forward_features(torch.from_numpy(img))
    j_out = j(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="dune"))

    feats = np.asarray(j_out.features)
    assert feats.shape == (1, 384, 4, 5)
    expected = t_out["x_norm_patchtokens"].numpy().reshape(1, 4, 5, 384).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(feats, expected, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# DINOv3 ConvNeXt — hand-written torch ConvNeXt in the official state-dict
# layout (reference wraps torch.hub dinov3_convnext_*, dinov3.py:257-371)
# ---------------------------------------------------------------------------


class _ChannelsFirstLayerNorm(nn.Module):
    "Official-ConvNeXt channels_first LayerNorm (weight/bias over the C dim of NCHW)."

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class _TorchConvNextBlock(nn.Module):
    "dw7x7 -> LN -> pw 4x -> GELU(exact) -> pw -> gamma, residual. NCHW outside."

    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        inp = x
        x = self.dwconv(x).permute(0, 2, 3, 1)
        x = self.pwconv2(F.gelu(self.pwconv1(self.norm(x))))
        return inp + (self.gamma * x).permute(0, 3, 1, 2)


class TorchConvNext(nn.Module):
    "ConvNeXt trunk, official key layout: downsample_layers.N.{0,1}, stages.N.M.*, norm."

    def __init__(self, depths, dims):
        super().__init__()
        self.downsample_layers = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(3, dims[0], 4, stride=4), _ChannelsFirstLayerNorm(dims[0]))]
            + [
                nn.Sequential(
                    _ChannelsFirstLayerNorm(dims[i]), nn.Conv2d(dims[i], dims[i + 1], 2, stride=2)
                )
                for i in range(3)
            ]
        )
        self.stages = nn.ModuleList(
            [nn.Sequential(*[_TorchConvNextBlock(dims[i]) for _ in range(depths[i])]) for i in range(4)]
        )
        self.norm = nn.LayerNorm(dims[-1], eps=1e-6)

    def stage_outputs(self, x):
        outs = []
        for i in range(4):
            x = self.stages[i](self.downsample_layers[i](x))
            outs.append(x)
        return outs

    def forward_features(self, img):
        out = self.stage_outputs(img)[-1]
        B, C, h, w = out.shape
        tokens = out.permute(0, 2, 3, 1).reshape(B, h * w, C)
        return {"x_norm_patchtokens": self.norm(tokens)}


def test_dinov3_convnext_parity_and_ckpt(tmp_path):
    """DINOv3ConvNextEncoder ('tiny': depths 3-3-9-3, dims 96-768) vs the
    hand-written torch ConvNeXt, loaded through pretrained_checkpoint_path
    (official 'model.downsample_layers.*' key layout, dinov3.py:325-333
    load semantics). Final grid is H/32 x W/32 (final_layer_patch_size=32)."""
    from uniception_tpu.models.encoders.dinov3 import DINOv3ConvNextEncoder
    from uniception_tpu.utils.checkpoint import save_checkpoint

    t = _TorchDINOv2Wrapper(_randomize(TorchConvNext((3, 3, 9, 3), (96, 192, 384, 768)), seed=11))
    # ConvNeXt is residual: 0.02-scale random weights keep activations sane
    sd = {k: v.numpy() for k, v in t.state_dict().items()}
    ckpt = str(tmp_path / "dinov3_convnext.npz")
    save_checkpoint(ckpt, sd)

    j = DINOv3ConvNextEncoder(
        name="dinov3_convnext", size="tiny", pretrained_checkpoint_path=ckpt, rngs=nnx.Rngs(0)
    )

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        t_out = t.model.forward_features(torch.from_numpy(img))
    j_out = j(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="dinov3"))

    feats = np.asarray(j_out.features)
    assert feats.shape == (2, 768, 2, 3)  # 64/32 x 96/32
    expected = t_out["x_norm_patchtokens"].numpy().reshape(2, 2, 3, 768).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(feats, expected, atol=1e-4, rtol=1e-4)


def test_dinov3_convnext_ifr_parity():
    "IFR variant: per-stage NCHW feature maps at the requested indices."
    from uniception_tpu.models.encoders.dinov3 import DINOv3ConvNextIntermediateFeatureReturner
    from uniception_tpu.utils.torch_compat import load_torch_state_dict

    t = _TorchDINOv2Wrapper(_randomize(TorchConvNext((3, 3, 9, 3), (96, 192, 384, 768)), seed=12))
    j = DINOv3ConvNextIntermediateFeatureReturner(
        name="dinov3_convnext", size="tiny", indices=[0, 2, 3], rngs=nnx.Rngs(0)
    )
    load_torch_state_dict(j, t.state_dict())

    rng = np.random.RandomState(1)
    img = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_outs = t.model.stage_outputs(torch.from_numpy(img))
    j_outs = j(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="dinov3"))

    assert len(j_outs) == 3
    for out, i in zip(j_outs, [0, 2, 3]):
        np.testing.assert_allclose(
            np.asarray(out.features), t_outs[i].numpy(), atol=1e-4, rtol=1e-4, err_msg=f"stage {i}"
        )


# ---------------------------------------------------------------------------
# RADIO — plain-ViT trunk (timm-style: registers, NO LayerScale, PE table at
# the 37x37 CPE training grid) vs the torch oracle; hub checkpoints are
# network-gated so only e-radio stays a flagged partial
# ---------------------------------------------------------------------------


def test_radio_parity_and_ckpt(tmp_path):
    """RADIOEncoder (radio_v2.5-b trunk dims, keep_first_n_layers=2) vs the
    torch oracle through pretrained_checkpoint_path: ckpt['model'] keys carry
    the 'model.' trunk prefix (reference radio.py:100-104 loads into the
    encoder itself) and hub-side junk keys must be tolerated (strict=False)."""
    from uniception_tpu.models.encoders.radio import RADIOEncoder
    from uniception_tpu.utils.checkpoint import save_checkpoint

    t = _TorchDINOv2Wrapper(
        _randomize(
            TorchDinoViT(img_size=16 * 37, patch_size=16, embed_dim=768, depth=2,
                         num_heads=12, num_register_tokens=8, init_values=None),
            seed=13,
        )
    )
    sd = {k: v.numpy() for k, v in t.state_dict().items()}
    assert not any(".ls1." in k or ".gamma" in k for k in sd), "RADIO ViT has no LayerScale"
    sd["input_conditioner.norm_mean"] = np.zeros((1, 3, 1, 1), np.float32)  # hub junk: skipped
    ckpt = str(tmp_path / "radio.npz")
    save_checkpoint(ckpt, sd)

    j = RADIOEncoder(
        name="radio", model_version="radio_v2.5-b", keep_first_n_layers=2,
        pretrained_checkpoint_path=ckpt, rngs=nnx.Rngs(0),
    )
    assert j.model.pos_embed[...].shape == (1, 37 * 37 + 1, 768)

    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 64, 96).astype(np.float32)  # 4x6 grid: interp from 37x37
    with torch.no_grad():
        t_out = t.model.forward_features(torch.from_numpy(img))
    j_out = j(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="radio"))

    feats = np.asarray(j_out.features)
    assert feats.shape == (1, 768, 4, 6)
    expected = t_out["x_norm_patchtokens"].numpy().reshape(1, 4, 6, 768).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(feats, expected, atol=1e-4, rtol=1e-4)


def test_radio_intermediate_returner_parity():
    "RADIO IFR: normed intermediate patch tokens vs a manual torch collect."
    from uniception_tpu.models.encoders.radio import RADIOIntermediateFeatureReturner
    from uniception_tpu.utils.torch_compat import load_torch_state_dict

    t = _TorchDINOv2Wrapper(
        _randomize(
            TorchDinoViT(img_size=16 * 37, patch_size=16, embed_dim=768, depth=2,
                         num_heads=12, num_register_tokens=8, init_values=None),
            seed=14,
        )
    )
    j = RADIOIntermediateFeatureReturner(
        name="radio", model_version="radio_v2.5-b", keep_first_n_layers=2,
        indices=[0, 1], rngs=nnx.Rngs(0),
    )
    load_torch_state_dict(j, t.state_dict())

    rng = np.random.RandomState(3)
    img = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        timg = torch.from_numpy(img)
        cls_pe, patch_pe = t.model._interp_pe(4, 4)
        x = t.model.patch_embed.proj(timg).flatten(2).transpose(1, 2) + patch_pe
        x = torch.cat(
            [(t.model.cls_token + cls_pe).expand(1, -1, -1),
             t.model.register_tokens.expand(1, -1, -1), x], 1
        )
        collected = []
        for blk in t.model.blocks:
            x = blk(x)
            collected.append(t.model.norm(x)[:, 1 + 8 :])  # normed patch tokens

    outs = j(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="radio"))
    assert len(outs) == 2
    for out, expect in zip(outs, collected):
        expected = expect.numpy().reshape(1, 4, 4, 768).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(np.asarray(out.features), expected, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# DINOv3-ViT — RoPE q/k on patch tokens only, storage tokens, no patch PE
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("H,W", [(64, 64), (64, 96)])
def test_dinov3_vit_parity(H, W):
    from uniception_tpu.models.encoders.dinov3 import DINOv3Encoder
    from uniception_tpu.utils.torch_compat import load_torch_state_dict

    t = _TorchDINOv2Wrapper(
        _randomize(TorchDinoV3ViT(embed_dim=384, depth=2, num_heads=6), seed=5)
    )
    j = DINOv3Encoder(name="dinov3", size="small", keep_first_n_layers=2, rngs=nnx.Rngs(0))
    load_torch_state_dict(j, t.state_dict())

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, H, W).astype(np.float32)
    with torch.no_grad():
        t_out = t.model.forward_features(torch.from_numpy(img))
    j_out = j(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="dinov3"))

    feats = np.asarray(j_out.features)
    hp, wp = H // 16, W // 16
    assert feats.shape == (2, 384, hp, wp)
    expected = t_out["x_norm_patchtokens"].numpy().reshape(2, hp, wp, 384).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(feats, expected, atol=1e-4, rtol=1e-4)
