"""
Global-attention, alternating-attention, multi-set and differential
cross-attention transformers: shape gates + torch-reference parity
(sequential view-index PE so both sides are deterministic).
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.info_sharing.alternating_attention_transformer import (
    MultiViewAlternatingAttentionTransformer,
)
from uniception_tpu.models.info_sharing.base import (
    MultiSetTransformerInput,
    MultiViewTransformerInput,
)
from uniception_tpu.models.info_sharing.diff_cross_attention_transformer import (
    DifferentialMultiViewCrossAttentionTransformer,
)
from uniception_tpu.models.info_sharing.global_attention_transformer import (
    GlobalAttentionTransformer,
    MultiViewGlobalAttentionTransformer,
)
from uniception_tpu.utils.torch_compat import load_torch_state_dict

SMALL = dict(input_embed_dim=96, depth=4, dim=64, num_heads=4)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items() if "pos_table" not in k}


def _feats(rng, num_views, c=96, h=7, w=7, b=2):
    return [rng.randn(b, c, h, w).astype(np.float32) for _ in range(num_views)]


def test_global_attention_shapes_and_extra_tokens():
    model = MultiViewGlobalAttentionTransformer(
        name="MV-GAT", max_num_views_for_pe=100, use_rand_idx_pe_for_non_reference_views=False,
        rngs=nnx.Rngs(0), **SMALL,
    )
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(f) for f in _feats(rng, 3)]
    extra_global = jnp.asarray(rng.randn(2, 96, 2).astype(np.float32))
    extra_pv = [jnp.asarray(rng.randn(2, 96, 3).astype(np.float32)) for _ in range(3)]
    out = model(
        MultiViewTransformerInput(
            features=feats, additional_input_tokens=extra_global, additional_input_tokens_per_view=extra_pv
        )
    )
    assert len(out.features) == 3 and all(f.shape == (2, 64, 7, 7) for f in out.features)
    assert out.additional_token_features.shape == (2, 64, 2)
    assert len(out.additional_token_features_per_view) == 3
    assert out.additional_token_features_per_view[0].shape == (2, 64, 3)


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
@pytest.mark.parametrize("num_views", [2, 3])
def test_global_attention_parity(num_views):
    add_reference_to_path()
    import torch
    from uniception.models.info_sharing.base import MultiViewTransformerInput as TIn
    from uniception.models.info_sharing.global_attention_transformer import (
        MultiViewGlobalAttentionTransformer as TModel,
    )

    torch.manual_seed(0)
    kwargs = dict(name="MV-GAT", max_num_views_for_pe=50, use_rand_idx_pe_for_non_reference_views=False, **SMALL)
    t = TModel(**kwargs)
    t.eval()
    j = MultiViewGlobalAttentionTransformer(rngs=nnx.Rngs(0), **kwargs)
    missing, unexpected = load_torch_state_dict(j, _sd(t))
    assert not missing

    rng = np.random.RandomState(1)
    feats = _feats(rng, num_views)
    with torch.no_grad():
        t_out = t(TIn(features=[torch.from_numpy(f) for f in feats]))
    j_out = j(MultiViewTransformerInput(features=[jnp.asarray(f) for f in feats]))
    for v in range(num_views):
        err = np.abs(t_out.features[v].numpy() - np.asarray(j_out.features[v])).max()
        assert err < 5e-5, f"view {v}: {err}"


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_alternating_attention_parity():
    add_reference_to_path()
    import torch
    from uniception.models.info_sharing.alternating_attention_transformer import (
        MultiViewAlternatingAttentionTransformer as TModel,
    )
    from uniception.models.info_sharing.base import MultiViewTransformerInput as TIn

    torch.manual_seed(0)
    kwargs = dict(name="MV-AAT", max_num_views_for_pe=50, use_rand_idx_pe_for_non_reference_views=False, **SMALL)
    t = TModel(**kwargs)
    t.eval()
    j = MultiViewAlternatingAttentionTransformer(rngs=nnx.Rngs(0), **kwargs)
    missing, unexpected = load_torch_state_dict(j, _sd(t))
    assert not missing

    rng = np.random.RandomState(2)
    feats = _feats(rng, 3)
    with torch.no_grad():
        t_out = t(TIn(features=[torch.from_numpy(f) for f in feats]))
    j_out = j(MultiViewTransformerInput(features=[jnp.asarray(f) for f in feats]))
    for v in range(3):
        err = np.abs(t_out.features[v].numpy() - np.asarray(j_out.features[v])).max()
        assert err < 5e-5, f"view {v}: {err}"


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_multiset_global_attention_parity():
    add_reference_to_path()
    import torch
    from uniception.models.info_sharing.base import MultiSetTransformerInput as TIn
    from uniception.models.info_sharing.global_attention_transformer import GlobalAttentionTransformer as TModel

    torch.manual_seed(0)
    kwargs = dict(name="GAT", max_num_sets=10, use_rand_idx_pe_for_non_reference_sets=False, **SMALL)
    t = TModel(**kwargs)
    t.eval()
    j = GlobalAttentionTransformer(rngs=nnx.Rngs(0), **kwargs)
    missing, unexpected = load_torch_state_dict(j, _sd(t))
    assert not missing

    rng = np.random.RandomState(3)
    feats = [rng.randn(2, 96, t_).astype(np.float32) for t_ in [9, 5, 13]]  # different token counts
    extra = rng.randn(2, 96, 2).astype(np.float32)
    with torch.no_grad():
        t_out = t(TIn(features=[torch.from_numpy(f) for f in feats], additional_input_tokens=torch.from_numpy(extra)))
    j_out = j(
        MultiSetTransformerInput(features=[jnp.asarray(f) for f in feats], additional_input_tokens=jnp.asarray(extra))
    )
    for s in range(3):
        err = np.abs(t_out.features[s].numpy() - np.asarray(j_out.features[s])).max()
        assert err < 5e-5, f"set {s}: {err}"
    err = np.abs(t_out.additional_token_features.numpy() - np.asarray(j_out.additional_token_features)).max()
    assert err < 5e-5


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_diff_cross_attention_parity():
    add_reference_to_path()
    import torch
    from uniception.models.info_sharing.base import MultiViewTransformerInput as TIn
    from uniception.models.info_sharing.diff_cross_attention_transformer import (
        DifferentialMultiViewCrossAttentionTransformer as TModel,
    )

    torch.manual_seed(0)
    kwargs = dict(name="D-MV-CAT", num_views=2, **SMALL)
    t = TModel(**kwargs)
    t.eval()
    j = DifferentialMultiViewCrossAttentionTransformer(rngs=nnx.Rngs(0), **kwargs)
    missing, unexpected = load_torch_state_dict(j, _sd(t))
    assert not missing and not unexpected

    rng = np.random.RandomState(4)
    feats = _feats(rng, 2, b=1)
    with torch.no_grad():
        t_out = t(TIn(features=[torch.from_numpy(f) for f in feats]))
    j_out = j(MultiViewTransformerInput(features=[jnp.asarray(f) for f in feats]))
    for v in range(2):
        err = np.abs(t_out.features[v].numpy() - np.asarray(j_out.features[v])).max()
        assert err < 5e-5, f"view {v}: {err}"
