"""
GPTQ calibration for the DUSt3R int8 serving path.

Captures per-layer input Hessians (H = E[x x^T]) by running the bf16
loop-layout model on calibration pairs, then re-rounds every trunk kernel
with GPTQ (nn/gptq.py) on the SAME symmetric per-output-channel grid the
RTN path uses — serving cost is unchanged, only the int8 codes improve.
Saves an npz of {path.w_q, path.w_scale} consumable by
``uniception_tpu.nn.gptq.apply_gptq`` on either trunk layout (loop or
scan/stacked), and prints the per-layer weight-error reduction in the
calibration metric (||W - Q s||_H vs RTN).

Weights: real checkpoints when you have them (--sd), else the torch-init
proxy (the same oracle cache scripts/tier_compare_torchinit.py builds, so
bills before/after are measured against one oracle). Calibration inputs:
random images by default (the proxy distribution the round-4 error bills
are quoted on, BASELINE.md); point --image-dir at real frames for
deployment calibration.

Usage (CPU ok, minutes at 512):
    JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu python scripts/calibrate_gptq.py \
        [--img 512] [--pairs 2] [--cache /tmp/tier_oracle.npz] \
        [--out /tmp/gptq_dust3r.npz] [--policy all]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model",
        default="dust3r",
        choices=["dust3r", "flow"],
        help="which composed model to calibrate (both expose encoder + info_sharing "
        "trunks; flow uses its own weights — pass --sd for a real checkpoint)",
    )
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--cache", default="/tmp/tier_oracle.npz", help="torch-init oracle cache (tier_compare_torchinit.py)")
    ap.add_argument("--sd", default=None, help="optional real checkpoint (.pth/.npz state dict) instead of the proxy init")
    ap.add_argument("--out", default="/tmp/gptq_dust3r.npz")
    ap.add_argument("--policy", default="all")
    ap.add_argument("--blocksize", type=int, default=128)
    ap.add_argument("--percdamp", type=float, default=0.01)
    ap.add_argument(
        "--image-dir",
        default=None,
        help="directory of real frames (.png/.jpg) for calibration — consecutive "
        "frames are paired; default: random images (the proxy distribution the "
        "round-4 bills are quoted on)",
    )
    ap.add_argument("--dtype", default="f32", choices=["f32", "f64"], help="host factorization dtype (f32 halves the O(d^3) cost)")
    ap.add_argument("--diag-every", type=int, default=10, help="compute the H-metric gptq/rtn diagnostic on every Nth layer (it costs as much as GPTQ itself)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.models.utils.config import set_attention_impl
    from uniception_tpu.nn.gptq import gptq_int8, harvest_hessians, install_hessian_capture
    from uniception_tpu.nn.quant import quantize_int8, trunk_policy
    from uniception_tpu.utils.torch_compat import load_torch_state_dict

    if args.model == "flow":
        # UFM-style flow model: same trunk structure (encoder + info_sharing),
        # so the whole pipeline applies unchanged; weights from --sd when
        # available, else the module's own init
        from uniception_tpu.models.factory.flow import UFMFlow

        model = UFMFlow(
            name="ufm_gptq_calib",
            img_size=(args.img, args.img),
            pred_head_type="dpt",
            scan_blocks=False,  # loop layout: per-depth Hessians
            rngs=nnx.Rngs(0),
        )
        if args.sd:
            from uniception_tpu.utils.checkpoint import load_checkpoint

            load_torch_state_dict(model, load_checkpoint(args.sd)["model"])
        set_attention_impl("xla")
    else:
        cfg = dict(
            name="dust3r_gptq_calib",
            img_size=(args.img, args.img),
            patch_embed_cls="ManyAR_PatchEmbed",
            pred_head_type="linear",
        )

        # --- weights: real checkpoint or the torch-init proxy oracle -----
        if args.sd:
            from uniception_tpu.utils.checkpoint import load_checkpoint

            sd = load_checkpoint(args.sd)["model"]
        elif os.path.exists(args.cache):
            data = np.load(args.cache)
            sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
            print(f"torch-init proxy weights from oracle cache: {args.cache}")
        else:
            from tests.conftest import add_reference_to_path

            add_reference_to_path()
            import torch
            from uniception.models.factory.dust3r import DUSt3R as TDUSt3R

            torch.manual_seed(0)
            t_model = TDUSt3R(**cfg)
            sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
            print("torch-init proxy weights built fresh (no oracle cache found)")

        model = DUSt3R(rngs=nnx.Rngs(0), scan_blocks=False, **cfg)  # loop layout: per-depth Hessians
        missing, unexpected = load_torch_state_dict(model, sd, ignore=model.checkpoint_alias_patterns())
        assert not missing and not unexpected, (missing, unexpected)
        set_attention_impl("xla")

    # serving quantizes the bf16-cast weights: calibrate on the same state
    gd0, st0 = nnx.split(model)
    st0 = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, st0)
    model = nnx.merge(gd0, st0)

    enc_pred, dec_pred = trunk_policy(args.policy)
    n = install_hessian_capture(model.encoder, predicate=enc_pred)
    n += install_hessian_capture(model.info_sharing, predicate=dec_pred)
    print(f"capturing Hessians for {n} trunk linears (policy={args.policy})")

    gd, st = nnx.split(model)

    @jax.jit
    def run(st, img1, img2):
        m = nnx.merge(gd, st)
        m.forward_pair(img1, img2)
        return nnx.split(m)[1]

    def calib_pairs():
        "Yields (img1, img2) NCHW float32, pre-normalized (what forward_pair expects)."
        if args.image_dir:
            from PIL import Image

            from uniception_tpu.models.encoders.image_normalizations import normalize_image

            files = sorted(
                os.path.join(args.image_dir, f)
                for f in os.listdir(args.image_dir)
                if f.lower().endswith((".png", ".jpg", ".jpeg"))
            )
            assert len(files) >= 2, f"--image-dir needs >=2 frames, found {len(files)}"
            frames = []
            for f in files[: 2 * args.pairs]:
                im = np.asarray(Image.open(f).convert("RGB").resize((args.img, args.img)), np.float32) / 255.0
                im = np.transpose(im, (2, 0, 1))[None]  # (1, 3, H, W) in [0, 1]
                frames.append(np.asarray(normalize_image(im, "dust3r"), np.float32))
            for i in range(0, len(frames) - 1, 2):
                yield jnp.asarray(frames[i]), jnp.asarray(frames[i + 1])
        else:
            rng = np.random.RandomState(7)  # NOT the bill's seed 42: calibration and eval stay disjoint
            for _ in range(args.pairs):
                yield (
                    jnp.asarray(rng.randn(1, 3, args.img, args.img).astype(np.float32)),
                    jnp.asarray(rng.randn(1, 3, args.img, args.img).astype(np.float32)),
                )

    t0 = time.time()
    n_pairs = 0
    for img1, img2 in calib_pairs():
        st = run(st, img1, img2)
        n_pairs += 1
        print(f"  pair {n_pairs} captured ({time.time() - t0:.0f}s)", flush=True)
    nnx.update(model, st)
    hessians = harvest_hessians(model)
    assert len(hessians) == n, (len(hessians), n)

    # --- GPTQ every captured layer ---------------------------------------
    kernels = {}

    def collect(mod, path=""):
        for name, child in list(vars(mod).items()):
            p = f"{path}.{name}".lstrip(".")
            if isinstance(child, nnx.Linear) and p in hessians:
                kernels[p] = np.asarray(child.kernel[...], np.float64)
            elif isinstance(child, nnx.Module):
                collect(child, p)
            elif isinstance(child, (list, nnx.List)):
                for i, c in enumerate(child):
                    if isinstance(c, nnx.Module):
                        collect(c, f"{p}.{i}")

    collect(model)
    assert set(kernels) == set(hessians), (len(kernels), len(hessians))

    fdt = np.float32 if args.dtype == "f32" else np.float64
    out, improvements = {}, []
    t0 = time.time()
    for i, (p, w) in enumerate(sorted(kernels.items())):
        H = hessians[p].astype(fdt)
        w_q, w_s = gptq_int8(w, H, blocksize=args.blocksize, percdamp=args.percdamp, dtype=fdt)
        out[f"{p}.w_q"] = w_q
        out[f"{p}.w_scale"] = w_s
        if i % args.diag_every == 0:
            r_q, r_s = quantize_int8(jnp.asarray(w, jnp.float32), axis=-2)
            r_q, r_s = np.asarray(r_q, fdt), np.asarray(r_s, fdt)
            wf = w.astype(fdt)

            def h_err(q, s):
                E = wf - q.astype(fdt) * s
                return float(np.sqrt(max(np.vdot(H @ E, E), 0.0)))  # tr(E^T H E) via BLAS

            e_g, e_r = h_err(w_q, w_s), h_err(r_q, r_s)
            improvements.append(e_g / max(e_r, 1e-30))
            print(f"  [{i + 1}/{len(kernels)}] {p}: H-err gptq/rtn = {improvements[-1]:.3f} ({time.time() - t0:.0f}s)", flush=True)

    np.savez(args.out, **out)
    print(
        f"GPTQ done: {len(kernels)} layers -> {args.out}; H-metric error ratio "
        f"gptq/rtn (sampled every {args.diag_every}) median {np.median(improvements):.3f} "
        f"worst {max(improvements):.3f}"
    )


if __name__ == "__main__":
    main()
