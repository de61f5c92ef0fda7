#!/usr/bin/env python
"""
DUSt3R end-to-end example with golden-output numeric parity gates.

TPU-native analogue of reference examples/models/dust3r/dust3r.py:100-261:
loads the four DUSt3R model configurations (224-linear, 512-linear,
512-dpt, 512-dpt-mast3r) from converted checkpoints, runs a symmetrized
two-view forward under full fp32 matmul precision, and asserts
abs_error < 1e-2 and rel_error < 1e-3 against the vanilla-DUSt3R golden
.npz outputs when present (reference :223-230).

Checkpoints: place UniCeption-format .pth/.npz files under
checkpoints/examples/<model_name>.{pth,npz} (see
scripts/download_checkpoints.py and scripts/convert_checkpoints.py).
Golden outputs go under reference_data/dust3r_pre_cvpr/<MODEL>/03_head_output.npz.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../.."))

import numpy as np


MODEL_CONFIGS = {
    "dust3r_224_linear": dict(img_size=(224, 224), pred_head_type="linear"),
    "dust3r_512_linear": dict(img_size=(512, 512), pred_head_type="linear"),
    "dust3r_512_dpt": dict(img_size=(512, 512), pred_head_type="dpt"),
    "dust3r_512_dpt_mast3r": dict(img_size=(512, 512), pred_head_type="dpt"),
}

GOLDEN_DIRS = {
    "dust3r_224_linear": "DUSt3R_224_linear",
    "dust3r_512_linear": "DUSt3R_512_linear",
    "dust3r_512_dpt": "DUSt3R_512_dpt",
    "dust3r_512_dpt_mast3r": "MASt3R_512_dpt",
}


def find_checkpoint(ckpt_dir, model_name):
    for ext in (".npz", ".pth", ".pt"):
        p = os.path.join(ckpt_dir, "examples", model_name + ext)
        if os.path.exists(p):
            return p
    return None


def load_example_images(img_size):
    "Load the two example images if present, else deterministic noise."
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        from PIL import Image

        from uniception_tpu.models.encoders.image_normalizations import normalize_image

        imgs = []
        for name in ("Chateau_1.png", "Chateau_2.png"):
            path = os.path.join(here, name)
            if not os.path.exists(path):
                raise FileNotFoundError(path)
            img = Image.open(path).convert("RGB").resize(img_size[::-1])
            arr = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
            imgs.append(normalize_image(arr, "dust3r"))
        return np.stack(imgs)
    except Exception:
        rng = np.random.RandomState(42)
        return rng.randn(2, 3, *img_size).astype(np.float32)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoints", default=os.path.join(os.path.dirname(__file__), "../../../checkpoints"))
    parser.add_argument("--reference-data", default=os.path.join(os.path.dirname(__file__), "../../../reference_data/dust3r_pre_cvpr"))
    parser.add_argument("--models", nargs="*", default=list(MODEL_CONFIGS))
    parser.add_argument("--viz", action="store_true", help="log point clouds to Rerun if installed")
    parser.add_argument(
        "--overrides",
        default=None,
        help="JSON dict of DUSt3R ctor overrides applied to every model "
        "(e.g. tiny dims for the golden-gate dry run, scripts/run_golden_gates.py)",
    )
    parser.add_argument(
        "--dump-golden",
        action="store_true",
        help="write 03_head_output.npz golden files under --reference-data from "
        "this run's outputs instead of checking against them (used by the "
        "run_golden_gates.py dry-run to prove the gate plumbing end-to-end)",
    )
    args = parser.parse_args()

    import jax

    # the golden data were collected with TF32 off / highest matmul precision
    # (reference :106-107)
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R

    overrides = {}
    if args.overrides:
        import json

        overrides = json.loads(args.overrides)
        if "img_size" in overrides:
            overrides["img_size"] = tuple(overrides["img_size"])

    any_verified = False
    for model_name in args.models:
        cfg = MODEL_CONFIGS[model_name]
        ckpt = find_checkpoint(args.checkpoints, model_name)
        if ckpt is None:
            print(f"[{model_name}] no checkpoint found under {args.checkpoints}/examples — skipping")
            continue

        print(f"[{model_name}] loading {ckpt}")
        kwargs = dict(
            img_size=cfg["img_size"],
            patch_embed_cls="PatchEmbedDust3R",
            pred_head_type=cfg["pred_head_type"],
        )
        kwargs.update(overrides)
        model = DUSt3R(
            name=model_name,
            pretrained_checkpoint_path=ckpt,
            rngs=nnx.Rngs(0),
            **kwargs,
        )

        imgs = load_example_images(kwargs["img_size"])
        img_tensor = jnp.asarray(imgs)
        view1 = {"img": img_tensor, "instance": ["0", "1"], "data_norm_type": "dust3r"}
        view2 = {"img": img_tensor[jnp.asarray([1, 0])], "instance": ["1", "0"], "data_norm_type": "dust3r"}

        res1, res2 = model(view1, view2)
        print(f"[{model_name}] forward pass completed")

        golden = os.path.join(args.reference_data, GOLDEN_DIRS[model_name], "03_head_output.npz")
        if args.dump_golden:
            os.makedirs(os.path.dirname(golden), exist_ok=True)
            np.savez(
                golden,
                head1_pts3d=np.asarray(res1["pts3d"]),
                head2_pts3d=np.asarray(res2["pts3d_in_other_view"]),
                head1_conf=np.asarray(res1["conf"])[..., 0],
                head2_conf=np.asarray(res2["conf"])[..., 0],
            )
            print(f"[{model_name}] golden outputs written to {golden}")
        elif os.path.exists(golden):
            ref = np.load(golden)
            checks = {
                "head1_pts3d": (np.asarray(res1["pts3d"]), ref["head1_pts3d"]),
                "head2_pts3d": (np.asarray(res2["pts3d_in_other_view"]), ref["head2_pts3d"]),
                "head1_conf": (np.asarray(res1["conf"])[..., 0], ref["head1_conf"]),
                "head2_conf": (np.asarray(res2["conf"])[..., 0], ref["head2_conf"]),
            }
            print(f"===== Checking for {model_name} model =====")
            for key, (out, refv) in checks.items():
                abs_error = np.abs(out - refv).max()
                rel_error = np.linalg.norm(out - refv) / np.linalg.norm(out)
                print(f"{key} abs_error: {abs_error}, rel_error: {rel_error}")
                assert abs_error < 1e-2 and rel_error < 1e-3, f"Error in {key} output"
            any_verified = True
        else:
            print(f"[{model_name}] no golden data at {golden} — parity gate skipped")

        if args.viz:
            from uniception_tpu.utils.viz import log_pointmaps_to_rerun

            log_pointmaps_to_rerun(model_name, res1, res2, imgs)

    print("Verified against goldens!" if any_verified else "Completed (no goldens available).")


if __name__ == "__main__":
    main()
