"""
Multi-view cross-attention transformer: shape gates + parity vs the torch
reference, including the IFR variant used by the DPT-head DUSt3R.
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput, MultiViewTransformerOutput
from uniception_tpu.models.info_sharing.cross_attention_transformer import (
    MultiViewCrossAttentionTransformer,
    MultiViewCrossAttentionTransformerIFR,
)
from uniception_tpu.utils.torch_compat import load_torch_state_dict

SMALL = dict(input_embed_dim=96, depth=4, dim=64, num_heads=4)


@pytest.mark.parametrize("num_views", [2, 3])
def test_shapes(num_views):
    model = MultiViewCrossAttentionTransformer(name="MV-CAT", num_views=num_views, rngs=nnx.Rngs(0), **SMALL)
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, 96, 7, 7).astype(np.float32)) for _ in range(num_views)]
    out = model(MultiViewTransformerInput(features=feats))
    assert isinstance(out, MultiViewTransformerOutput)
    assert len(out.features) == num_views
    assert all(f.shape == (1, 64, 7, 7) for f in out.features)


def test_ifr_last_layer_matches_final():
    model = MultiViewCrossAttentionTransformerIFR(
        name="MV-CAT-IFR", num_views=2, indices=[-1], norm_intermediate=True, rngs=nnx.Rngs(0), **SMALL
    )
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, 96, 7, 7).astype(np.float32)) for _ in range(2)]
    final, inter = model(MultiViewTransformerInput(features=feats))
    assert len(inter) == 1
    for v in range(2):
        assert np.allclose(np.asarray(final.features[v]), np.asarray(inter[-1].features[v]))


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
@pytest.mark.parametrize("num_views", [2, 3])
def test_parity_vs_reference(num_views):
    add_reference_to_path()
    import torch
    from uniception.models.info_sharing.base import MultiViewTransformerInput as TIn
    from uniception.models.info_sharing.cross_attention_transformer import (
        MultiViewCrossAttentionTransformer as TModel,
    )

    torch.manual_seed(0)
    t_model = TModel(name="MV-CAT", num_views=num_views, **SMALL)
    t_model.eval()
    j_model = MultiViewCrossAttentionTransformer(name="MV-CAT", num_views=num_views, rngs=nnx.Rngs(0), **SMALL)
    missing, unexpected = load_torch_state_dict(
        j_model, {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    )
    assert not missing and not unexpected

    rng = np.random.RandomState(3)
    feats = [rng.randn(2, 96, 7, 7).astype(np.float32) for _ in range(num_views)]
    with torch.no_grad():
        t_out = t_model(TIn(features=[torch.from_numpy(f) for f in feats]))
    j_out = j_model(MultiViewTransformerInput(features=[jnp.asarray(f) for f in feats]))

    for v in range(num_views):
        err = np.abs(t_out.features[v].numpy() - np.asarray(j_out.features[v])).max()
        assert err < 5e-5, f"view {v}: max abs err {err}"


@pytest.mark.skipif(not has_reference(), reason="torch reference not available")
def test_ifr_parity_vs_reference():
    add_reference_to_path()
    import torch
    from uniception.models.info_sharing.base import MultiViewTransformerInput as TIn
    from uniception.models.info_sharing.cross_attention_transformer import (
        MultiViewCrossAttentionTransformerIFR as TModel,
    )

    torch.manual_seed(0)
    kwargs = dict(name="MV-CAT-IFR", num_views=2, indices=[1, 2], norm_intermediate=False, **SMALL)
    t_model = TModel(**kwargs)
    t_model.eval()
    j_model = MultiViewCrossAttentionTransformerIFR(rngs=nnx.Rngs(0), **kwargs)
    load_torch_state_dict(j_model, {k: v.detach().numpy() for k, v in t_model.state_dict().items()})

    rng = np.random.RandomState(4)
    feats = [rng.randn(1, 96, 7, 7).astype(np.float32) for _ in range(2)]
    with torch.no_grad():
        t_final, t_inter = t_model(TIn(features=[torch.from_numpy(f) for f in feats]))
    j_final, j_inter = j_model(MultiViewTransformerInput(features=[jnp.asarray(f) for f in feats]))

    assert len(t_inter) == len(j_inter) == 2
    for t_o, j_o in [(t_final, j_final)] + list(zip(t_inter, j_inter)):
        for v in range(2):
            err = np.abs(t_o.features[v].numpy() - np.asarray(j_o.features[v])).max()
            assert err < 5e-5, f"max abs err {err}"
