"""Measure int8-serving parity vs the fp32 reference path on the full-size
model (DUSt3R ViT-L 512, random weights — offline proxy; golden-weight
parity needs network for checkpoints).

Reports max-abs and relative-L2 error on pts3d/conf for (a) the bf16
serving path and (b) the int8 w8a8 serving path, both against fp32-highest.
Thresholds mirror the reference's golden gate (abs < 1e-2, rel < 1e-3,
reference examples/models/dust3r/dust3r.py:223-230); results go to
BASELINE.md.

Usage: python scripts/check_quant_parity.py [--img 512] [--batch 1]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.nn.quant import quantize_linears

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(args.batch, 3, args.img, args.img).astype(np.float32))
    img2 = jnp.asarray(rng.randn(args.batch, 3, args.img, args.img).astype(np.float32))

    def build(dtype):
        return DUSt3R(
            name="parity",
            img_size=(args.img, args.img),
            patch_embed_cls="ManyAR_PatchEmbed",
            pred_head_type="linear",
            dtype=dtype,
            rngs=nnx.Rngs(0),
        )

    def run(model):
        graphdef, state = nnx.split(model)

        @jax.jit
        def f(state, a, b):
            m = nnx.merge(graphdef, state)
            r1, r2 = m.forward_pair(a, b)
            # trunk (encoder) feature map as well: with RANDOM weights the
            # exp pointmap adaptor amplifies tiny trunk noise into large
            # absolute output error (even pure bf16 fails the abs gate), so
            # feature-space error is the meaningful precision metric here;
            # trained-weight golden parity needs downloaded checkpoints.
            from uniception_tpu.models.encoders.base import ViTEncoderInput

            feat = m.encoder(ViTEncoderInput(image=a, data_norm_type=m.data_norm_type)).features
            return r1["pts3d"], r1["conf"], feat.astype(jnp.float32)

        pts, conf, feat = f(state, img1, img2)
        return np.asarray(pts, np.float32), np.asarray(conf, np.float32), np.asarray(feat, np.float32)

    with jax.default_matmul_precision("highest"):
        ref_pts, ref_conf, ref_feat = run(build(jnp.float32))

    results = {}
    # bf16 serving path
    m = build(jnp.bfloat16)
    gd, st = nnx.split(m)
    st = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, st)
    results["bf16"] = run(nnx.merge(gd, st))
    # int8 serving path on top of bf16
    m = nnx.merge(gd, st)
    n_q = quantize_linears(m.encoder) + quantize_linears(m.info_sharing)
    print(f"int8-quantized {n_q} trunk linears")
    results["int8"] = run(m)

    for name, (pts, conf, feat) in results.items():
        for tag, out, ref in (("pts3d", pts, ref_pts), ("conf", conf, ref_conf), ("trunk_feat", feat, ref_feat)):
            abs_err = np.abs(out - ref).max()
            rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
            print(f"{name} vs fp32-highest  {tag}: abs={abs_err:.3e} rel={rel:.3e}")


if __name__ == "__main__":
    main()
