"""
DPT-head module fwd/bwd benchmark — mirror of the reference's own harness.

The reference ships a DPT fwd/bwd latency + peak-memory printer at the
bottom of its dpt.py (/root/reference/uniception/models/prediction_heads/
dpt.py:576-676): DPTFeature(patch 14, hooks [2,5,8,11], input dims
[1024,768,768,768], feature 256, checkpoint_gradient=True) +
DPTRegressionProcessor, batch 12 at 560x420, TF32 on. This script runs the
same module at the same shapes on TPU, with chained lax.scan timing (the
axon tunnel adds ~100 ms per fetch; per-call CUDA-event-style timing would
mis-attribute it) and reports fwd, fwd+bwd, and — when the backend exposes
it — peak device memory.

Usage: python scripts/bench_dpt_head.py [--batch 12] [--no-remat] [--dtype f32|bf16]
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--image", type=int, nargs=2, default=(560, 420))
    ap.add_argument("--patch", type=int, default=14)
    ap.add_argument("--no-remat", action="store_true", help="checkpoint_gradient off")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.prediction_heads.base import PredictionHeadLayeredInput
    from uniception_tpu.models.prediction_heads.dpt import DPTFeature, DPTRegressionProcessor
    from uniception_tpu.utils.profile import benchmark_fn_chained

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    remat = not args.no_remat
    feature = DPTFeature(
        patch_size=args.patch,
        hooks=[2, 5, 8, 11],
        input_feature_dims=[1024, 768, 768, 768],
        layer_dims=[96, 192, 384, 768],
        feature_dim=256,
        checkpoint_gradient=remat,
        dtype=dtype,
        rngs=nnx.Rngs(0),
    )
    processor = DPTRegressionProcessor(
        input_feature_dim=256, output_dim=3, checkpoint_gradient=remat, dtype=dtype, rngs=nnx.Rngs(1)
    )
    f_def, f_state = nnx.split(feature)
    p_def, p_state = nnx.split(processor)

    H, W = args.image
    ph, pw = H // args.patch, W // args.patch
    rng = np.random.RandomState(0)
    dims = {2: 1024, 5: 768, 8: 768, 11: 768}
    feats = {
        h: jnp.asarray(rng.randn(args.batch, d, ph, pw).astype(np.float32)) for h, d in dims.items()
    }

    def fwd(f_state, p_state, feats, carry):
        fm = nnx.merge(f_def, f_state)
        pm = nnx.merge(p_def, p_state)
        lf = [None] * 12
        for h in dims:
            lf[h] = feats[h] + carry * 1e-12
        out = pm(fm(PredictionHeadLayeredInput(list_features=lf, target_output_shape=(H, W))))
        return out.decoded_channels.sum().astype(jnp.float32)

    def fwd_bwd(f_state, p_state, feats, carry):
        # grads w.r.t. the hook features, matching the reference harness's
        # requires_grad=True inputs (dpt.py:610-613); params stay constant
        loss, g = jax.value_and_grad(lambda fs: fwd(f_state, p_state, fs, carry))(feats)
        return loss + sum(jnp.vdot(v, v) for v in g.values()).astype(jnp.float32)

    results = {}
    for name, fn in [("fwd", fwd), ("fwd_bwd", fwd_bwd)]:
        # pass operands as ARGUMENTS (closing over them would inline ~60 MB
        # of feature constants into the HLO, which the remote-compile
        # helper rejects with HTTP 413)
        ms = benchmark_fn_chained(fn, f_state, p_state, feats, iters=args.iters) * 1e3
        results[name] = ms
        print(
            json.dumps(
                {
                    "metric": f"dpt_head_{name}_ms",
                    "value": round(ms, 2),
                    "unit": "ms",
                    "config": f"b{args.batch} {H}x{W} p{args.patch} remat={int(remat)} {args.dtype}",
                }
            )
        )

    stats = jax.local_devices()[0].memory_stats()
    if stats and "peak_bytes_in_use" in stats:
        print(
            json.dumps(
                {"metric": "dpt_head_peak_mem_mb", "value": round(stats["peak_bytes_in_use"] / 1e6, 1), "unit": "MB"}
            )
        )
    print(
        f"ratio bwd/fwd={results['fwd_bwd'] / results['fwd']:.2f} "
        f"(reference harness prints its numbers at runtime only — not published)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
