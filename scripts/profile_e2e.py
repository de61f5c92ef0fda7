#!/usr/bin/env python
"""
Per-stage timing of the headline DUSt3R pipeline at the bench configuration.

Splits the end-to-end pairs/s budget into encoder / info-sharing /
heads+adaptors device time (scan-chained, utils/profile.py) so perf work
targets the real bottleneck. Mirrors the reference's component harnesses
(uniception/models/encoders/utils.py:11-81, prediction_heads/dpt.py:576-676)
but stage-sliced on the composed model.

Usage:
    python scripts/profile_e2e.py [--batch 2] [--img 512] [--quant int8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--head", default="linear", choices=["linear", "dpt"])
    ap.add_argument("--quant", default="int8", choices=["int8", "none"])
    ap.add_argument("--scan", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.encoders.base import ViTEncoderInput
    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput
    from uniception_tpu.models.utils.config import set_attention_impl, set_gelu_mode
    from uniception_tpu.utils.profile import benchmark_fn_chained

    set_attention_impl(os.environ.get("BENCH_ATTN", "pallas"))
    set_gelu_mode(os.environ.get("BENCH_GELU", "tanh"))

    B, IMG = args.batch, args.img
    model = DUSt3R(
        name=f"dust3r_{IMG}_{args.head}",
        img_size=(IMG, IMG),
        patch_embed_cls="ManyAR_PatchEmbed",
        pred_head_type=args.head,
        dtype=jnp.bfloat16,
        scan_blocks=bool(args.scan),
        rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(model)
    state = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state)
    model = nnx.merge(graphdef, state)
    if args.quant == "int8":
        from uniception_tpu.nn.quant import quantize_linears

        n_q = quantize_linears(model.encoder) + quantize_linears(model.info_sharing)
        print(f"int8-quantized {n_q} trunk linears")
    graphdef, state = nnx.split(model)

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(B, 3, IMG, IMG).astype(np.float32))
    img2 = jnp.asarray(rng.randn(B, 3, IMG, IMG).astype(np.float32))
    ts = jnp.broadcast_to(jnp.asarray([IMG, IMG], jnp.int32), (B, 2))
    ts2 = jnp.concatenate([ts, ts], axis=0)
    imgs = jnp.concatenate([img1, img2], axis=0)

    n_tok = (IMG // 16) ** 2
    feat_hw = IMG // 16
    # encoder output features, BCHW (what _encode_image_pairs returns per view)
    f1 = jnp.asarray(rng.randn(B, 1024, feat_hw, feat_hw).astype(np.float32)).astype(jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(B, 1024, feat_hw, feat_hw).astype(np.float32)).astype(jnp.bfloat16)

    def c_(c, t):
        return (c * 1e-12).astype(t.dtype)

    def full(state, c):
        m = nnx.merge(graphdef, state)
        r1, r2 = m.forward_pair(img1 + c_(c, img1), img2, true_shape1=ts, true_shape2=ts)
        return (r1["pts3d"].mean() + r2["pts3d_in_other_view"].mean()).astype(jnp.float32)

    def encoder_only(state, c):
        m = nnx.merge(graphdef, state)
        out = m.encoder(ViTEncoderInput(image=imgs + c_(c, imgs), data_norm_type=m.data_norm_type, true_shape=ts2))
        return out.features.mean().astype(jnp.float32)

    def info_sharing_only(state, c):
        m = nnx.merge(graphdef, state)
        out = m.info_sharing(MultiViewTransformerInput(features=[f1 + c_(c, f1), f2]))
        if isinstance(out, tuple):
            final = out[0]
        else:
            final = out
        return final.features[0].mean().astype(jnp.float32)

    def decode_predict(state, c):
        m = nnx.merge(graphdef, state)
        r1, r2 = m._decode_and_predict(f1 + c_(c, f1), f2, (IMG, IMG), (IMG, IMG))
        return (r1["pts3d"].mean() + r2["pts3d_in_other_view"].mean()).astype(jnp.float32)

    stages = {
        "full_pipeline": full,
        "encoder(2 views batched)": encoder_only,
        "info_sharing": info_sharing_only,
        "decode+heads+adaptors": decode_predict,
    }
    times = {}
    for name, fn in stages.items():
        sec = benchmark_fn_chained(fn, state, iters=args.iters)
        times[name] = sec * 1e3
        print(f"{name:28s} {sec * 1e3:8.2f} ms")

    heads = times["decode+heads+adaptors"] - times["info_sharing"]
    other = times["full_pipeline"] - times["encoder(2 views batched)"] - times["decode+heads+adaptors"]
    print(f"{'heads+adaptors (derived)':28s} {heads:8.2f} ms")
    print(f"{'patch-embed/glue (derived)':28s} {other:8.2f} ms")
    print(f"pairs/s = {B / (times['full_pipeline'] / 1e3):.1f}  (batch {B}, {IMG}px, {args.head}, {args.quant})")


if __name__ == "__main__":
    main()
