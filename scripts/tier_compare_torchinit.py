"""Quant-mode decision measurement on the TORCH-INIT proxy.

The nnx-random-weight sweep (sweep_quant_policy.py) overstates every bill:
torch's reference init (trunc-normal .02, zero-init LayerScale paths) gives
smaller activations and ~2x lower bf16/int8 error accumulation at full size
(measured: bf16 rel 6.2e-3 torch-init vs 1.3e-2 nnx-random). Decisions about
the serving default (sym vs asym) therefore get made HERE, on the realistic
init, with the torch fp32-highest forward cached so all variants share one
oracle. CPU-runnable (bf16 CPU is slow — minutes per variant at 512).

Usage: JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu python scripts/tier_compare_torchinit.py \
           [--img 512] [--cache /tmp/tier_oracle.npz]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--cache", default="/tmp/tier_oracle.npz")
    ap.add_argument("--gptq", default=None, help="GPTQ codes npz (scripts/calibrate_gptq.py) — adds an int8+GPTQ rung")
    args = ap.parse_args()

    from tests.conftest import add_reference_to_path

    add_reference_to_path()
    import torch

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.models.utils.config import set_attention_impl
    from uniception_tpu.nn.quant import quantize_trunk
    from uniception_tpu.utils.torch_compat import load_torch_state_dict

    cfg = dict(
        name="dust3r_tier",
        img_size=(args.img, args.img),
        patch_embed_cls="ManyAR_PatchEmbed",
        pred_head_type="linear",
    )
    rng = np.random.RandomState(42)
    img1 = rng.randn(1, 3, args.img, args.img).astype(np.float32)
    img2 = rng.randn(1, 3, args.img, args.img).astype(np.float32)

    if os.path.exists(args.cache):
        data = np.load(args.cache)
        ref_pts, sd = data["pts3d"], {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
        if ref_pts.shape[1:3] != (args.img, args.img):
            # cache is keyed by file path only: a stale oracle from a
            # different --img would otherwise be silently compared against
            raise SystemExit(
                f"oracle cache {args.cache} was built at {ref_pts.shape[1]}px but --img={args.img}; "
                "pass a per-size --cache path (e.g. /tmp/tier_oracle_{img}.npz) or delete it"
            )
        print(f"oracle cache hit: {args.cache}")
    else:
        from uniception.models.factory.dust3r import DUSt3R as TDUSt3R

        torch.manual_seed(0)
        torch.set_float32_matmul_precision("highest")
        t_model = TDUSt3R(**cfg)
        t_model.eval()
        view1 = {"img": torch.from_numpy(img1), "instance": ["0"], "data_norm_type": "dust3r"}
        view2 = {"img": torch.from_numpy(img2), "instance": ["1"], "data_norm_type": "dust3r"}
        with torch.no_grad():
            t_res1, _ = t_model(view1, view2)
        ref_pts = t_res1["pts3d"].numpy()
        sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
        np.savez(args.cache, pts3d=ref_pts, **{f"sd.{k}": v for k, v in sd.items()})
        print(f"oracle written: {args.cache}")

    j_model = DUSt3R(rngs=nnx.Rngs(0), scan_blocks=True, **cfg)
    missing, unexpected = load_torch_state_dict(j_model, sd, ignore=j_model.checkpoint_alias_patterns())
    assert not missing and not unexpected, (missing, unexpected)
    set_attention_impl("xla")

    gd, st = nnx.split(j_model)
    st_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, st)

    def bill(model, label):
        r1, _ = model.forward_pair(jnp.asarray(img1), jnp.asarray(img2))
        out = np.asarray(r1["pts3d"], np.float32)
        a = np.abs(out - ref_pts).max()
        r = float(np.linalg.norm(out - ref_pts) / np.linalg.norm(ref_pts))
        print(f"{label:<28} pts3d abs={a:.3e} rel={r:.3e}", flush=True)

    # the f32_gate rung: the exact BENCH_TIER=f32_gate numerics (scan layout,
    # f32 params, matmul precision highest, exact GELU, XLA attention) must
    # pass the reference's golden thresholds (abs<1e-2, rel<1e-3)
    from uniception_tpu.models.utils.config import set_gelu_mode

    set_gelu_mode("exact")
    with jax.default_matmul_precision("highest"):
        bill(nnx.merge(gd, st), "f32_gate (scan, highest)")
    set_gelu_mode(os.environ.get("UNICEPTION_TPU_GELU", "exact"))

    bill(nnx.merge(gd, st_bf16), "bf16+scan")
    for label, policy, asym in [
        ("int8 all sym", "all", "none"),
        ("int8 all asym=*.fc2", "all", "*.fc2"),
        ("int8 all asym=all", "all", "all"),
    ]:
        m = nnx.merge(gd, st_bf16)
        quantize_trunk(m, policy, asym=asym)
        bill(m, label)

    if args.gptq:
        from uniception_tpu.nn.gptq import apply_gptq, load_gptq_npz

        m = nnx.merge(gd, st_bf16)
        quantize_trunk(m, "all", asym="none")
        n = apply_gptq(m, load_gptq_npz(args.gptq))
        bill(m, f"int8 all sym + GPTQ ({n} layers)")


if __name__ == "__main__":
    main()
