"""Zero-cost weight-transform ladder for the int8 serving bill (VERDICT r4 #1).

ONE calibration capture (Hessians + per-channel activation maxima on the
loop layout), then every variant is measured against the same cached
fp32-highest torch oracle (the tier_compare_torchinit.py convention):

    rtn                      — the round-2 int8 baseline (all, sym)
    rtn  + smooth(alpha…)    — SmoothQuant scale migration, alpha sweep
    rtn  + rotate            — QuaRot per-head Hadamard on the v->proj pair
    gptq                     — Hessian-aware re-rounding (round-4 config)
    gptq + smooth(best a)    — transforms first, GPTQ on transformed weights
    gptq + rotate            —   (Hessians updated analytically, nn/smooth.py)
    gptq + smooth + rotate   — the stack

Every rung serves at IDENTICAL throughput: same compiled program, same
kernels, same scale layout — only the weights/codes differ (verified
on-chip: bench.py BENCH_TIER=int8 is transform-agnostic).

Usage (CPU, ~1-2 h at 512 with GPTQ rungs — run in background):
    JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu python scripts/quant_transforms.py \
        [--img 512] [--cache /tmp/tier_oracle.npz] [--pairs 2] \
        [--alphas 0,0.25,0.5] [--skip-gptq]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--cache", default="/tmp/tier_oracle.npz")
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--alphas", default="0,0.25,0.5")
    ap.add_argument("--skip-gptq", action="store_true")
    ap.add_argument("--blocksize", type=int, default=128)
    ap.add_argument("--percdamp", type=float, default=0.01)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.models.utils.config import set_attention_impl
    from uniception_tpu.nn.gptq import (
        apply_gptq,
        gptq_int8,
        harvest_act_amax,
        harvest_hessians,
        install_hessian_capture,
    )
    from uniception_tpu.nn.quant import quantize_trunk
    from uniception_tpu.nn.smooth import rotate_trunk, smooth_trunk
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

    if not os.path.exists(args.cache):
        raise SystemExit(f"oracle cache {args.cache} missing — run scripts/tier_compare_torchinit.py first")
    data = np.load(args.cache)
    ref_pts = data["pts3d"]
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    if ref_pts.shape[1:3] != (args.img, args.img):
        raise SystemExit(f"oracle cache is {ref_pts.shape[1]}px but --img={args.img}")
    print(f"oracle cache: {args.cache}")
    set_attention_impl("xla")

    def fresh(scan):
        m = DUSt3R(rngs=nnx.Rngs(0), scan_blocks=scan, **cfg)
        missing, unexpected = load_torch_state_dict(m, sd, ignore=m.checkpoint_alias_patterns())
        assert not missing and not unexpected, (missing, unexpected)
        gd, st = nnx.split(m)
        st = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, st)
        return nnx.merge(gd, st)

    # --- calibration capture: once, loop layout, bf16-cast weights --------
    t0 = time.time()
    calib = fresh(scan=False)
    n = install_hessian_capture(calib.encoder)
    n += install_hessian_capture(calib.info_sharing)
    print(f"capturing H + amax for {n} trunk linears …", flush=True)
    gd, st = nnx.split(calib)

    @jax.jit
    def run(st, a, b):
        m = nnx.merge(gd, st)
        m.forward_pair(a, b)
        return nnx.split(m)[1]

    crng = np.random.RandomState(7)
    for i in range(args.pairs):
        st = run(
            st,
            jnp.asarray(crng.randn(1, 3, args.img, args.img).astype(np.float32)),
            jnp.asarray(crng.randn(1, 3, args.img, args.img).astype(np.float32)),
        )
        print(f"  pair {i + 1}/{args.pairs} ({time.time() - t0:.0f}s)", flush=True)
    nnx.update(calib, st)
    amax = harvest_act_amax(calib)
    hessians = harvest_hessians(calib)
    del calib, st
    print(f"capture done: {len(hessians)} layers, {time.time() - t0:.0f}s", flush=True)

    def bill(m, label):
        r1, _ = m.forward_pair(jnp.asarray(img1), jnp.asarray(img2))
        out = np.asarray(r1["pts3d"], np.float32)
        a = np.abs(out - ref_pts).max()
        r = float(np.linalg.norm(out - ref_pts) / np.linalg.norm(ref_pts))
        print(f"{label:<34} pts3d abs={a:.3e} rel={r:.3e}", flush=True)
        return r

    def collect_kernels(m, paths):
        "Loop-layout float kernels of the captured layers."
        ks = {}

        def walk(mod, path=""):
            for name, child in list(vars(mod).items()):
                p = f"{path}.{name}".lstrip(".")
                if isinstance(child, nnx.Linear) and p in paths:
                    ks[p] = np.asarray(child.kernel[...], np.float64)
                elif isinstance(child, nnx.Module):
                    walk(child, p)
                elif isinstance(child, (list, nnx.List)):
                    for i, c in enumerate(child):
                        if isinstance(c, nnx.Module):
                            walk(c, f"{p}.{i}")

        walk(m)
        assert set(ks) == set(paths), (len(ks), len(paths))
        return ks

    def measure(label, alpha=None, rotate=False, gptq=False):
        h = dict(hessians) if gptq else None
        m = fresh(scan=True)
        if alpha is not None:
            # the scan model and the loop GPTQ model get IDENTICAL transforms
            # (deterministic in (weights, amax, alpha, seed))
            smooth_trunk(m, amax, alpha=alpha, hessians=None)
        if rotate:
            rotate_trunk(m)
        quantize_trunk(m, "all", asym="none")
        if gptq:
            ml = fresh(scan=False)
            if alpha is not None:
                smooth_trunk(ml, amax, alpha=alpha, hessians=h)
            if rotate:
                rotate_trunk(ml, hessians=h)
            kernels = collect_kernels(ml, set(hessians))
            del ml
            codes, tg = {}, time.time()
            for i, (p, w) in enumerate(sorted(kernels.items())):
                codes[p] = gptq_int8(
                    w, h[p].astype(np.float32), blocksize=args.blocksize, percdamp=args.percdamp, dtype=np.float32
                )
                if (i + 1) % 50 == 0:
                    print(f"  gptq {i + 1}/{len(kernels)} ({time.time() - tg:.0f}s)", flush=True)
            applied = apply_gptq(m, codes)
            assert applied > 0, "no GPTQ codes applied"
        return bill(m, label)

    results = {"rtn": measure("rtn (int8 all sym)")}
    alphas = [float(a) for a in args.alphas.split(",") if a.strip()]
    best_alpha, best_r = None, results["rtn"]
    for a in alphas:
        r = measure(f"rtn + smooth(a={a})", alpha=a)
        results[f"smooth_{a}"] = r
        if r < best_r:
            best_alpha, best_r = a, r
    results["rotate"] = measure("rtn + rotate", rotate=True)
    if best_alpha is not None:
        results["smooth_rotate"] = measure(
            f"rtn + smooth(a={best_alpha}) + rotate", alpha=best_alpha, rotate=True
        )

    if not args.skip_gptq:
        results["gptq"] = measure("gptq", gptq=True)
        if best_alpha is not None:
            results["gptq_smooth"] = measure(f"gptq + smooth(a={best_alpha})", alpha=best_alpha, gptq=True)
        results["gptq_rotate"] = measure("gptq + rotate", rotate=True, gptq=True)
        if best_alpha is not None:
            results["gptq_smooth_rotate"] = measure(
                f"gptq + smooth(a={best_alpha}) + rotate", alpha=best_alpha, rotate=True, gptq=True
            )

    print("\nsummary (pts3d rel vs fp32-highest torch oracle):")
    for k, v in results.items():
        print(f"  {k:<22} {v:.3e}")


if __name__ == "__main__":
    main()
