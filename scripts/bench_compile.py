"""Compile-time benchmark: Python-loop blocks vs scan-over-stacked-blocks.

Measures trace+lower+compile wall time of the jitted DUSt3R forward for the
loop layout (reference-style per-depth modules, every block traced) and the
scan layout (nn/scan.py, the block traces once). Numbers are recorded in
BASELINE.md (VERDICT round-1 items 4/10).

Usage:
    python scripts/bench_compile.py [--img 512] [--batch 2] [--head linear]
    JAX_PLATFORM_NAME=cpu python scripts/bench_compile.py   # host-only timing
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--head", default="linear", choices=["linear", "dpt"])
    ap.add_argument("--layouts", default="loop,scan")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(args.batch, 3, args.img, args.img).astype(np.float32))
    img2 = jnp.asarray(rng.randn(args.batch, 3, args.img, args.img).astype(np.float32))

    for layout in args.layouts.split(","):
        t0 = time.perf_counter()
        model = DUSt3R(
            name=f"dust3r_{args.img}_{args.head}",
            img_size=(args.img, args.img),
            patch_embed_cls="ManyAR_PatchEmbed",
            pred_head_type=args.head,
            dtype=jnp.bfloat16,
            scan_blocks=(layout == "scan"),
            rngs=nnx.Rngs(0),
        )
        graphdef, state = nnx.split(model)
        state = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state)
        t_construct = time.perf_counter() - t0

        def fwd(state, img1, img2):
            m = nnx.merge(graphdef, state)
            r1, r2 = m.forward_pair(img1, img2)
            return r1["pts3d"], r1["conf"], r2["pts3d_in_other_view"]

        t0 = time.perf_counter()
        lowered = jax.jit(fwd).lower(state, img1, img2)
        t_trace = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        # warm-cache second compile (persistent compilation cache hit, if any)
        t0 = time.perf_counter()
        jax.jit(fwd).lower(state, img1, img2).compile()
        t_warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(state, img1, img2)
        jax.block_until_ready(out)
        t_first_run = time.perf_counter() - t0

        print(
            f"{layout:5s} head={args.head} img={args.img}: construct={t_construct:.1f}s "
            f"trace={t_trace:.1f}s compile={t_compile:.1f}s warm-recompile={t_warm:.1f}s "
            f"first_run={t_first_run:.2f}s total_cold={t_construct + t_trace + t_compile:.1f}s"
        )


if __name__ == "__main__":
    main()
