"""Mixed-precision int8 policy sweep: error bill per trunk-quantization
policy at the headline shape (DUSt3R ViT-L 512, random weights, on-chip).

For each policy (nn/quant.py::trunk_policy) this measures the relative-L2
error of pts3d / conf / trunk features against BOTH the fp32-highest
reference path and the bf16 serving path. The bf16 column isolates the
*marginal int8 bill* (VERDICT r3 #1: cut it from 2-3% rel to <1%); the
fp32 column is the total serving error. Throughput per surviving policy
is measured separately via `BENCH_QUANT_POLICY=<spec> python bench.py`.

Run on the TPU (default env). Results -> BASELINE.md round 4.

Usage: python scripts/sweep_quant_policy.py [--img 512] [--batch 1]
       [--policies "all;enc.*;*.mlp;..."]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_POLICIES = [
    "all",            # round-2/3 serving default
    "enc.*",          # decoder (closest to the heads) stays bf16
    "*.mlp",          # MLPs only (2/3 of linear FLOPs), attention projs bf16
    "*.fc2",          # wide-K fc2 only
    "enc.*,dec.mlp",  # full encoder + decoder MLPs
    "enc.mlp",        # encoder MLPs only
    "enc.*,dec.fc2",
    "*.qkv,*.mlp",    # everything except attention out/cross projections
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--policies", default=";".join(DEFAULT_POLICIES))
    ap.add_argument(
        "--asym",
        default=None,
        help="asym spec passed to quantize_trunk (default None = quantize_trunk's "
        "own default: UNICEPTION_TPU_INT8_ASYM_POLICY env, falling back to 'none' "
        "= all-symmetric — the measured serving default; 'all' = zero-point everywhere)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.nn.quant import quantize_trunk

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(args.batch, 3, args.img, args.img).astype(np.float32))
    img2 = jnp.asarray(rng.randn(args.batch, 3, args.img, args.img).astype(np.float32))

    def build(dtype):
        return DUSt3R(
            name="sweep",
            img_size=(args.img, args.img),
            patch_embed_cls="ManyAR_PatchEmbed",
            pred_head_type="linear",
            dtype=dtype,
            scan_blocks=True,
            rngs=nnx.Rngs(0),
        )

    def run(model):
        graphdef, state = nnx.split(model)

        @jax.jit
        def f(state, a, b):
            m = nnx.merge(graphdef, state)
            r1, _ = m.forward_pair(a, b)
            from uniception_tpu.models.encoders.base import ViTEncoderInput

            feat = m.encoder(ViTEncoderInput(image=a, data_norm_type=m.data_norm_type)).features
            return r1["pts3d"], r1["conf"], feat.astype(jnp.float32)

        outs = f(state, img1, img2)
        return tuple(np.asarray(o, np.float32) for o in outs)

    print("fp32 reference forward ...", flush=True)
    with jax.default_matmul_precision("highest"):
        ref = run(build(jnp.float32))

    m = build(jnp.bfloat16)
    gd, st_bf16 = nnx.split(m)
    st_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, st_bf16)
    print("bf16 forward ...", flush=True)
    bf16 = run(nnx.merge(gd, st_bf16))

    def rel(a, b):
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)

    names = ("pts3d", "conf", "trunk_feat")
    print(f"\n{'policy':<24} {'n_q':>4}  " + "  ".join(f"{n}/fp32 {n}/bf16" for n in names))
    row = "bf16 (parity cfg)        -  "
    row += "  ".join(f"{rel(bf16[i], ref[i]):.3e}   {'-':>9}" for i in range(3))
    print(row, flush=True)

    for spec in args.policies.split(";"):
        spec = spec.strip()
        if not spec:
            continue
        model = nnx.merge(gd, st_bf16)
        n_q = quantize_trunk(model, spec, asym=args.asym)
        outs = run(model)
        cells = "  ".join(
            f"{rel(outs[i], ref[i]):.3e} {rel(outs[i], bf16[i]):.3e}" for i in range(3)
        )
        print(f"{spec:<24} {n_q:>4}  {cells}", flush=True)


if __name__ == "__main__":
    main()
