#!/usr/bin/env python
"""
DUSt3R throughput sweep over batch sizes and resolutions.

TPU-native analogue of reference examples/models/dust3r/profile_dust3r.py:27-47
(torch.utils.benchmark over batch {1,2,4,8} at 224² and 512²). Timing is
scan-chained on-device; runs in bf16 with the Pallas flash-attention kernel
and tanh GELU (production configuration).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../.."))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batches", nargs="*", type=int, default=[1, 2, 4, 8])
    parser.add_argument("--sizes", nargs="*", type=int, default=[224, 512])
    parser.add_argument("--head", default="linear", choices=["linear", "dpt"])
    parser.add_argument("--gelu", default="tanh", choices=["tanh", "exact"])
    parser.add_argument("--quant", default="none", choices=["none", "int8"], help="w8a8 trunk linears (nn/quant.py)")
    parser.add_argument("--scan", action="store_true", help="scan-over-stacked-blocks layout")
    parser.add_argument("--head-dtype", default="fp32", choices=["fp32", "bf16"])
    args = parser.parse_args()

    import jax.numpy as jnp
    from flax import nnx
    import jax

    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.models.utils.config import set_attention_impl, set_gelu_mode
    from uniception_tpu.utils.profile import benchmark_fn_chained

    set_attention_impl("pallas" if jax.devices()[0].platform == "tpu" else "xla")
    set_gelu_mode(args.gelu)

    for img in args.sizes:
        model = DUSt3R(
            name=f"dust3r_{img}_{args.head}",
            img_size=(img, img),
            patch_embed_cls="PatchEmbedDust3R",
            pred_head_type=args.head,
            head_dtype=jnp.bfloat16 if args.head_dtype == "bf16" else None,
            scan_blocks=args.scan,
            dtype=jnp.bfloat16,
            rngs=nnx.Rngs(0),
        )
        graphdef, state = nnx.split(model)
        state = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state)
        if args.quant == "int8":
            from uniception_tpu.nn.quant import quantize_trunk

            model = nnx.merge(graphdef, state)
            n_q = quantize_trunk(model, "all")
            print(f"int8-quantized {n_q} trunk linears")
            graphdef, state = nnx.split(model)

        def fwd(state, img1, img2, c):
            m = nnx.merge(graphdef, state)
            r1, r2 = m.forward_pair(img1 + c * 1e-12, img2)
            return r1["pts3d"].mean() + r2["pts3d_in_other_view"].mean()

        rng = np.random.RandomState(0)
        for batch in args.batches:
            img1 = jnp.asarray(rng.randn(batch, 3, img, img).astype(np.float32))
            img2 = jnp.asarray(rng.randn(batch, 3, img, img).astype(np.float32))
            sec = benchmark_fn_chained(fwd, state, img1, img2, iters=8)
            print(f"  {img}x{img} {args.head} batch {batch:2d}: {sec*1e3:8.2f} ms/fwd  {batch/sec:7.2f} pairs/s")


if __name__ == "__main__":
    main()
