"""
Vanilla-DUSt3R checkpoint conversion round trip.

Builds a tiny DUSt3R, exports its weights in torch layout, inverse-maps them
to the *vanilla* DUSt3R key schema (enc_blocks/dec_blocks/downstream_headX...),
then runs the converter's ``remap_vanilla_dust3r`` and loads the result back
strictly. Covers both head variants, including the nn.Linear -> 1x1-conv
reshape and the dpt.head.{0,2,4} -> conv1/conv2.{0,2} regressor remap that
the reference converter performs
(examples/models/dust3r/convert_dust3r_weights_to_uniception.py:95-103,216).
"""

import os
import sys

import pytest

import numpy as np
from flax import nnx

import jax.numpy as jnp

from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.utils.torch_compat import load_torch_state_dict, state_dict_from_module

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "scripts"))
from convert_checkpoints import remap_vanilla_dust3r  # noqa: E402

SMALL = dict(
    enc_embed_dim=96,
    enc_depth=3,
    enc_num_heads=4,
    info_sharing_dim=64,
    info_sharing_num_heads=4,
)


def _to_vanilla(repo_sd, pred_head_type):
    "Inverse of remap_vanilla_dust3r: repo torch-layout keys -> vanilla keys."
    reg_inv = {"conv1": "head.0", "conv2.0": "head.2", "conv2.2": "head.4"}
    out = {}
    for k, v in repo_sd.items():
        if k.startswith("encoder."):
            nk = k[len("encoder."):]
        elif k.startswith("info_sharing.multi_view_branches.0."):
            nk = "dec_blocks." + k[len("info_sharing.multi_view_branches.0."):]
        elif k.startswith("info_sharing.multi_view_branches.1."):
            nk = "dec_blocks2." + k[len("info_sharing.multi_view_branches.1."):]
        elif k.startswith("info_sharing.proj_embed."):
            nk = "decoder_embed." + k[len("info_sharing.proj_embed."):]
        elif k.startswith("info_sharing.norm."):
            nk = "dec_norm." + k[len("info_sharing.norm."):]
        elif k.startswith(("head1.linear.", "head2.linear.")):
            head = k[4]
            nk = f"downstream_head{head}.proj." + k.split(".linear.", 1)[1]
            if nk.endswith(".weight"):
                v = v.reshape(v.shape[0], v.shape[1])  # (out,in,1,1) -> (out,in)
        elif k.startswith(("dpt_feature_head1.", "dpt_feature_head2.")):
            head = k[len("dpt_feature_head")]
            nk = f"downstream_head{head}.dpt." + k.split(".", 1)[1]
        elif k.startswith(("dpt_regressor_head1.", "dpt_regressor_head2.")):
            head = k[len("dpt_regressor_head")]
            sub = k.split(".", 1)[1]
            for ours, vanilla in reg_inv.items():
                if sub.startswith(ours + "."):
                    sub = vanilla + sub[len(ours):]
                    break
            nk = f"downstream_head{head}.dpt.{sub}"
        else:
            raise AssertionError(f"unmapped repo key {k}")
        out[nk] = v
    return out


def _roundtrip(pred_head_type, **over):
    kwargs = dict(name="dust3r_small", img_size=(64, 64), pred_head_type=pred_head_type, **SMALL)
    kwargs.update(over)
    model = DUSt3R(rngs=nnx.Rngs(0), **kwargs)
    repo_sd = state_dict_from_module(model)
    vanilla = _to_vanilla(repo_sd, pred_head_type)
    remapped = remap_vanilla_dust3r(vanilla)

    fresh = DUSt3R(rngs=nnx.Rngs(1), **kwargs)
    missing, unexpected = load_torch_state_dict(fresh, remapped, strict=True)
    assert not missing and not unexpected

    rng = np.random.RandomState(3)
    img1 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    img2 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    a1, a2 = model.forward_pair(img1, img2)
    b1, b2 = fresh.forward_pair(img1, img2)
    np.testing.assert_allclose(np.asarray(a1["pts3d"]), np.asarray(b1["pts3d"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a2["pts3d_in_other_view"]), np.asarray(b2["pts3d_in_other_view"]), atol=1e-6
    )


def test_roundtrip_linear():
    _roundtrip("linear", info_sharing_depth=2)


@pytest.mark.slow
def test_roundtrip_dpt():
    # factory hardcodes DPT hooks [5, 8] (reference factory/dust3r.py:134-144),
    # so the info-sharing depth must cover them
    _roundtrip("dpt", info_sharing_depth=9, pred_head_feature_dim=32)


def test_shared_decoder_duplication():
    "Checkpoints without dec_blocks2 get the decoder duplicated into branch 1."
    kwargs = dict(name="dust3r_small", img_size=(64, 64), info_sharing_depth=2, **SMALL)
    model = DUSt3R(rngs=nnx.Rngs(0), **kwargs)
    vanilla = _to_vanilla(state_dict_from_module(model), "linear")
    shared = {k: v for k, v in vanilla.items() if not k.startswith("dec_blocks2.")}
    remapped = remap_vanilla_dust3r(shared)
    b0 = {k: v for k, v in remapped.items() if k.startswith("info_sharing.multi_view_branches.0.")}
    assert b0, "branch 0 missing after remap"
    for k, v in b0.items():
        k1 = k.replace(".multi_view_branches.0.", ".multi_view_branches.1.")
        assert k1 in remapped
        np.testing.assert_array_equal(np.asarray(v), np.asarray(remapped[k1]))
