#!/usr/bin/env python
"""
Cosmos tokenizer throughput: continuous-image encode / decode / autoencode
at 512² (reference ships the tokenizer with no numbers —
uniception/models/libs/cosmos_tokenizer; this records the TPU rate).

Usage: python scripts/bench_cosmos.py [--batch 4] [--img 512] [--patch 8]
       python scripts/bench_cosmos.py --video [--frames 17] [--img 256]
Prints one JSON line per stage. --video benches the causal-3D CV tokenizer
(FACTORIZED encoder/decoder, 8x8 spatial x 8 temporal compression) in
frames/s — the SURVEY's "largest single porting effort", previously parity-
tested but unbenched.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_video(args):
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.libs.cosmos_tokenizer.networks import TokenizerConfigs
    from uniception_tpu.models.libs.cosmos_tokenizer.networks.continuous_video import (
        CausalContinuousVideoTokenizer,
    )
    from uniception_tpu.utils.profile import benchmark_fn_chained

    cfg = dict(TokenizerConfigs.CV.value)
    model = CausalContinuousVideoTokenizer(dtype=jnp.bfloat16, rngs=nnx.Rngs(0), **cfg)
    gd, st = nnx.split(model)
    st = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, st)
    model = nnx.merge(gd, st)

    T = args.frames  # causal: 1 + 8k frames -> 1 + k latent frames
    rng = np.random.RandomState(0)
    vid = jnp.asarray(rng.rand(args.batch, 3, T, args.img, args.img).astype(np.float32) * 2 - 1)
    latent = model.encode(vid)[0]
    print(f"CV {args.img}² x {T} frames -> latent {latent.shape}", file=sys.stderr)

    def enc(vid, c):
        z, _ = model.encode(vid + (c * 1e-12).astype(vid.dtype))
        return z.mean().astype(jnp.float32)

    def dec(latent, c):
        return model.decode(latent + (c * 1e-12).astype(latent.dtype)).mean().astype(jnp.float32)

    def roundtrip(vid, c):
        z, _ = model.encode(vid + (c * 1e-12).astype(vid.dtype))
        return model.decode(z).mean().astype(jnp.float32)

    n_frames = args.batch * T
    for name, fn, arg in (("encode", enc, vid), ("decode", dec, latent), ("autoencode", roundtrip, vid)):
        sec = benchmark_fn_chained(fn, arg, iters=args.iters)
        print(
            json.dumps(
                {
                    "metric": f"cosmos_cv_{args.img}x{T}f_{name}_frames_per_sec",
                    "value": round(n_frames / sec, 2),
                    "unit": "frames/s/chip",
                }
            )
        )


def main():
    ap = argparse.ArgumentParser()
    # image mode defaults: batch 4 @ 512²; video mode: batch 1 @ 256² x 17.
    # None-defaults resolved per mode so an explicit --img 512 --video works.
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--img", type=int, default=None)
    ap.add_argument("--patch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--video", action="store_true", help="bench the causal-3D CV tokenizer")
    ap.add_argument("--frames", type=int, default=17, help="video frames (1 + 8k for the causal 8x path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.img is None:
        args.img = 256 if args.video else 512
    if args.batch is None:
        args.batch = 1 if args.video else 4

    if args.video:
        bench_video(args)
        return
    from flax import nnx

    from uniception_tpu.models.encoders.base import ViTEncoderInput
    from uniception_tpu.models.encoders.cosmos import CosmosEncoder
    from uniception_tpu.models.prediction_heads.cosmos import CosmosSingleChannel
    from uniception_tpu.utils.profile import benchmark_fn_chained

    encoder = CosmosEncoder(name="cosmos", patch_size=args.patch, dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    decoder = CosmosSingleChannel(patch_size=args.patch, dtype=jnp.bfloat16, rngs=nnx.Rngs(1))
    for m in (encoder, decoder):
        gd, st = nnx.split(m)
        st = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, st)
        nnx.update(m, st)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(args.batch, 3, args.img, args.img).astype(np.float32) * 2 - 1)
    latent = encoder(ViTEncoderInput(image=img, data_norm_type="cosmos")).features

    def enc(img, c):
        out = encoder(ViTEncoderInput(image=img + (c * 1e-12).astype(img.dtype), data_norm_type="cosmos"))
        return out.features.mean().astype(jnp.float32)

    def dec(latent, c):
        return decoder(latent + (c * 1e-12).astype(latent.dtype)).mean().astype(jnp.float32)

    def roundtrip(img, c):
        z = encoder(ViTEncoderInput(image=img + (c * 1e-12).astype(img.dtype), data_norm_type="cosmos")).features
        return decoder(z).mean().astype(jnp.float32)

    for name, fn, arg in (("encode", enc, img), ("decode", dec, latent), ("autoencode", roundtrip, img)):
        sec = benchmark_fn_chained(fn, arg, iters=args.iters)
        print(
            json.dumps(
                {
                    "metric": f"cosmos_ci{args.patch}x{args.patch}_{args.img}_{name}_images_per_sec",
                    "value": round(args.batch / sec, 2),
                    "unit": "images/s/chip",
                }
            )
        )


if __name__ == "__main__":
    main()
