"""Full-size DUSt3R ViT-L 512 parity gate vs the torch reference (slow).

The reference's strongest correctness gate runs its 4 DUSt3R configs against
golden .npz outputs (reference examples/models/dust3r/dust3r.py:223-230,
abs < 1e-2 / rel < 1e-3, fp32 matmul precision "highest"). Goldens require
network, so this offline gate does the next-strongest thing VERDICT.md asks
for: construct the reference's own full-size DUSt3R factory (ViT-L/1024/24
encoder, 768/12 decoder, 512x512, ManyAR patch embed) with random init,
copy the identical weights into our model, and assert the reference's own
thresholds on pts3d/conf. This exercises 24-deep ViT-L error accumulation,
ManyAR at 512, and the DPT head at real resolution — none of which the
small-config tests cover.

Run with: pytest tests/models/test_dust3r_fullsize.py --run-slow
Measured errors are recorded in BASELINE.md (full-size parity row).
"""

import numpy as np
import pytest
from flax import nnx

import jax.numpy as jnp

from tests.conftest import add_reference_to_path, has_reference
from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.utils.torch_compat import load_torch_state_dict

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="torch reference not available"),
]


@pytest.mark.parametrize("head", ["linear", "dpt"])
def test_fullsize_vitl_512_parity(head):
    add_reference_to_path()
    import torch
    from uniception.models.factory.dust3r import DUSt3R as TDUSt3R

    torch.manual_seed(0)
    torch.set_float32_matmul_precision("highest")
    cfg = dict(
        name=f"dust3r_512_{head}",
        img_size=(512, 512),
        patch_embed_cls="ManyAR_PatchEmbed",
        pred_head_type=head,
    )
    t_model = TDUSt3R(**cfg)
    t_model.eval()

    j_model = DUSt3R(rngs=nnx.Rngs(0), **cfg)
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    missing, unexpected = load_torch_state_dict(j_model, sd, ignore=j_model.checkpoint_alias_patterns())
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(42)
    img1 = rng.randn(1, 3, 512, 512).astype(np.float32)
    img2 = rng.randn(1, 3, 512, 512).astype(np.float32)
    view1 = {"img": torch.from_numpy(img1), "instance": ["0"], "data_norm_type": "dust3r"}
    view2 = {"img": torch.from_numpy(img2), "instance": ["1"], "data_norm_type": "dust3r"}
    with torch.no_grad():
        t_res1, t_res2 = t_model(view1, view2)

    res1, res2 = j_model.forward_pair(jnp.asarray(img1), jnp.asarray(img2))

    checks = [
        ("pts3d", np.asarray(t_res1["pts3d"]), np.asarray(res1["pts3d"])),
        ("conf", np.asarray(t_res1["conf"]), np.asarray(res1["conf"])),
        ("pts3d_in_other_view", np.asarray(t_res2["pts3d_in_other_view"]), np.asarray(res2["pts3d_in_other_view"])),
        ("conf2", np.asarray(t_res2["conf"]), np.asarray(res2["conf"])),
    ]
    for name, ref, out in checks:
        assert ref.shape == out.shape, (name, ref.shape, out.shape)
        abs_err = np.abs(ref - out).max()
        rel_err = np.linalg.norm(ref - out) / np.linalg.norm(ref)
        print(f"[fullsize {head}] {name}: abs={abs_err:.2e} rel={rel_err:.2e}")
        # the reference's own golden thresholds (dust3r.py:230)
        assert abs_err < 1e-2, (name, abs_err)
        assert rel_err < 1e-3, (name, rel_err)


def test_fullsize_serving_tier_error_bill():
    """Accuracy bill of the BENCH serving tiers at full size (the precision
    ladder in BASELINE.md round 4): bf16+scan (BENCH_QUANT=none) and the
    int8 headline config (policy=all, symmetric), both measured against the
    torch fp32-highest oracle on the random-weight proxy.

    Neither serving tier passes the reference's strict golden thresholds on
    this proxy (bf16 matmul rounding alone is ~1e-2 rel after 36 residual
    blocks of random weights); the fp32-highest rung above does — that is
    the documented ladder, mirroring the reference's own situation (its
    A100-fp16 serving estimate, the 60.44 pairs/s baseline, would not pass
    its fp32 golden gate either). The asserted ceilings here are regression
    tripwires at ~1.5x the measured bills, not parity claims.
    """
    add_reference_to_path()
    import torch
    from uniception.models.factory.dust3r import DUSt3R as TDUSt3R

    from uniception_tpu.models.utils.config import get_attention_impl, set_attention_impl
    from uniception_tpu.nn.quant import quantize_trunk

    torch.manual_seed(0)
    torch.set_float32_matmul_precision("highest")
    cfg = dict(
        name="dust3r_512_linear",
        img_size=(512, 512),
        patch_embed_cls="ManyAR_PatchEmbed",
        pred_head_type="linear",
    )
    t_model = TDUSt3R(**cfg)
    t_model.eval()

    # bench layout: scan-over-stacked-blocks (stacked ckpt key mapping)
    j_model = DUSt3R(rngs=nnx.Rngs(0), scan_blocks=True, **cfg)
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    missing, unexpected = load_torch_state_dict(j_model, sd, ignore=j_model.checkpoint_alias_patterns())
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(42)
    img1 = rng.randn(1, 3, 512, 512).astype(np.float32)
    img2 = rng.randn(1, 3, 512, 512).astype(np.float32)
    view1 = {"img": torch.from_numpy(img1), "instance": ["0"], "data_norm_type": "dust3r"}
    view2 = {"img": torch.from_numpy(img2), "instance": ["1"], "data_norm_type": "dust3r"}
    with torch.no_grad():
        t_res1, _ = t_model(view1, view2)
    ref_pts = np.asarray(t_res1["pts3d"])

    import jax

    prev_impl = get_attention_impl()
    set_attention_impl("xla")  # pallas would run in interpret mode on CPU
    try:
        gd, st = nnx.split(j_model)
        st_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, st)

        def bill(model):
            r1, _ = model.forward_pair(jnp.asarray(img1), jnp.asarray(img2))
            out = np.asarray(r1["pts3d"], np.float32)
            return np.abs(out - ref_pts).max(), float(
                np.linalg.norm(out - ref_pts) / np.linalg.norm(ref_pts)
            )

        abs_bf16, rel_bf16 = bill(nnx.merge(gd, st_bf16))
        print(f"[tier bf16+scan]   pts3d abs={abs_bf16:.2e} rel={rel_bf16:.2e}")

        m_int8 = nnx.merge(gd, st_bf16)
        n_q = quantize_trunk(m_int8, "all", asym="none")
        assert n_q > 0
        abs_i8, rel_i8 = bill(m_int8)
        print(f"[tier int8 headline] pts3d abs={abs_i8:.2e} rel={rel_i8:.2e} (n_q={n_q})")
    finally:
        set_attention_impl(prev_impl)

    # regression tripwires (~1.5x the measured round-4 bills, BASELINE.md)
    assert rel_bf16 < 2.5e-2, rel_bf16
    assert rel_i8 < 4.0e-2, rel_i8
    # the headline tier must stay in the same accuracy class as the bf16
    # serving tier it is priced against (not an order worse); measured
    # 3.1x at torch init (1.95e-2 vs 6.2e-3)
    assert rel_i8 < 4.5 * max(rel_bf16, 1e-3), (rel_i8, rel_bf16)
