#!/usr/bin/env python
"""
Golden-gate readiness runner: ONE command from raw torch checkpoints to
the full DUSt3R parity-gate table plus the encoder test suite.

Real mode (when checkpoints exist):
    python scripts/run_golden_gates.py --raw /path/to/torch_ckpts \\
        [--reference-data reference_data/dust3r_pre_cvpr]
  1. matches raw .pth files to the four DUSt3R configs (224-linear,
     512-linear, 512-dpt, 512-dpt-mast3r) by name,
  2. converts each to the native interchange .npz (vanilla-DUSt3R key
     remap) AND a --serving .nsv variant (scripts/convert_checkpoints.py),
  3. runs examples/models/dust3r/dust3r.py over all four configs, printing
     the golden-gate table (abs < 1e-2, rel < 1e-3 — reference
     examples/models/dust3r/dust3r.py:223-230),
  4. runs the encoder unit suite (tests/models/encoders_suite).

Dry-run mode (no network, random weights — proves the plumbing today):
    python scripts/run_golden_gates.py --dry-run
  builds a tiny DUSt3R, saves it as an interchange checkpoint, converts it
  (plain + --serving --int8), generates golden outputs via the example's
  --dump-golden, then re-runs the example against those goldens and
  asserts the gate passes. Every moving part of the real flow — converter,
  checkpoint discovery, example forward, golden comparison — executes.
"""

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# raw-filename fragments -> example model names (download_checkpoints.py names)
RAW_MATCHES = [
    ("224_linear", "dust3r_224_linear"),
    ("512_linear", "dust3r_512_linear"),
    ("512_dpt", "dust3r_512_dpt"),
    ("mast3r", "dust3r_512_dpt_mast3r"),
]

TINY = dict(
    img_size=[64, 64],
    enc_embed_dim=96,
    enc_depth=2,
    enc_num_heads=4,
    info_sharing_dim=64,
    info_sharing_depth=2,
    info_sharing_num_heads=4,
)


def _run(argv, **kw):
    print("+", " ".join(argv), flush=True)
    return subprocess.run(argv, cwd=REPO, **kw)


def _match_model(fname):
    low = fname.lower()
    if "mast3r" in low:
        return "dust3r_512_dpt_mast3r"
    for frag, name in RAW_MATCHES:
        if frag in low:
            return name
    return None


def real_mode(args):
    ckpt_dir = os.path.abspath(args.checkpoints)
    os.makedirs(os.path.join(ckpt_dir, "examples"), exist_ok=True)
    raws = sorted(os.listdir(args.raw)) if os.path.isdir(args.raw) else []
    matched = {}
    for f in raws:
        if not f.endswith((".pth", ".pt")):
            continue
        name = _match_model(f)
        if name and name not in matched:
            matched[name] = os.path.join(args.raw, f)
    if not matched:
        print(f"no raw torch checkpoints found under {args.raw!r} — nothing to do.")
        print("(offline? run with --dry-run to exercise the gate plumbing on random weights)")
        return 1

    for name, raw in matched.items():
        out = os.path.join(ckpt_dir, "examples", name + ".npz")
        r = _run([sys.executable, "scripts/convert_checkpoints.py", raw, out, "--dust3r"])
        if r.returncode:
            return r.returncode
        head = "dpt" if "dpt" in name else "linear"
        img = 224 if "224" in name else 512
        serve = os.path.join(ckpt_dir, "examples", name + ".serve.nsv")
        r = _run([
            sys.executable, "scripts/convert_checkpoints.py", out, serve,
            "--serving", "--img-size", str(img), "--head", head,
        ])
        if r.returncode:
            return r.returncode

    r = _run([
        sys.executable, "examples/models/dust3r/dust3r.py",
        "--checkpoints", ckpt_dir, "--reference-data", args.reference_data,
        "--models", *matched.keys(),
    ])
    if r.returncode:
        return r.returncode

    print("\n=== encoder unit suite ===", flush=True)
    r = _run([sys.executable, "-m", "pytest", "tests/models/encoders_suite", "-q"])
    return r.returncode


def dry_run(args):
    import json

    import numpy as np

    # tiny-model plumbing check: run on CPU (the ambient env pins the TPU
    # tunnel, where per-op dispatch would dominate) — both in-process and
    # in every child process
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"

    tmp = tempfile.mkdtemp(prefix="golden_dry_")
    try:
        ckpt_dir = os.path.join(tmp, "checkpoints")
        ref_dir = os.path.join(tmp, "reference_data")
        os.makedirs(os.path.join(ckpt_dir, "examples"))

        # 1. tiny random-weight model -> interchange checkpoint
        print("=== dry run: synthesizing a tiny random-weight checkpoint ===", flush=True)
        from flax import nnx

        from uniception_tpu.models.factory.dust3r import DUSt3R
        from uniception_tpu.utils.checkpoint import save_checkpoint
        from uniception_tpu.utils.torch_compat import state_dict_from_module

        ctor_kwargs = dict(TINY)
        ctor_kwargs["img_size"] = tuple(ctor_kwargs["img_size"])
        model = DUSt3R(name="dust3r_224_linear", patch_embed_cls="PatchEmbedDust3R",
                       pred_head_type="linear", rngs=nnx.Rngs(0), **ctor_kwargs)
        raw = os.path.join(tmp, "dust3r_224_linear_raw.npz")
        save_checkpoint(raw, state_dict_from_module(model))

        # 2. converter: interchange passthrough + --serving --int8 variant
        out = os.path.join(ckpt_dir, "examples", "dust3r_224_linear.npz")
        r = _run([sys.executable, "scripts/convert_checkpoints.py", raw, out])
        assert r.returncode == 0, "converter failed"
        serve = os.path.join(ckpt_dir, "examples", "dust3r_224_linear.serve.nsv")
        tiny_flags = [
            "--img-size", "64", "--head", "linear",
            "--enc-dim", "96", "--enc-depth", "2", "--enc-heads", "4",
            "--dec-dim", "64", "--dec-depth", "2", "--dec-heads", "4",
        ]
        r = _run([sys.executable, "scripts/convert_checkpoints.py", out, serve,
                  "--serving", "--int8", *tiny_flags])
        assert r.returncode == 0, "serving converter failed"
        from uniception_tpu.utils.coldstart import is_native_state

        assert is_native_state(serve), "serving checkpoint is not a native state"

        # 3. generate goldens through the example itself (--dump-golden),
        #    then 4. re-run and require the gate to PASS
        overrides = json.dumps(TINY)
        base = [
            sys.executable, "examples/models/dust3r/dust3r.py",
            "--checkpoints", ckpt_dir, "--reference-data", ref_dir,
            "--models", "dust3r_224_linear", "--overrides", overrides,
        ]
        r = _run(base + ["--dump-golden"], capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "golden outputs written" in r.stdout

        golden = os.path.join(ref_dir, "DUSt3R_224_linear", "03_head_output.npz")
        assert os.path.exists(golden)
        g = np.load(golden)
        assert g["head1_pts3d"].shape == (2, 64, 64, 3)

        r = _run(base, capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Verified against goldens!" in r.stdout, r.stdout

        print("\ndry run PASSED: converter (+--serving --int8), checkpoint "
              "discovery, example forward, and golden-gate comparison all "
              "executed end-to-end on random weights.")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--raw", default="checkpoints/raw", help="directory of raw torch .pth checkpoints")
    ap.add_argument("--checkpoints", default="checkpoints", help="output/native checkpoint root")
    ap.add_argument("--reference-data", default="reference_data/dust3r_pre_cvpr")
    ap.add_argument("--dry-run", action="store_true", help="offline plumbing check on random weights")
    args = ap.parse_args()
    sys.exit(dry_run(args) if args.dry_run else real_mode(args))


if __name__ == "__main__":
    main()
