#!/usr/bin/env python
"""
Per-stage timing of the DUSt3R training step (fwd+bwd+adamw) at the bench
configuration — the train-side analogue of scripts/profile_e2e.py.

Splits the pairs/s training budget into:
  * loss forward                      (matches inference + loss overhead)
  * value_and_grad                    (adds the full backward)
  * full step                         (adds the adamw update)
  * per-stage fwd+bwd via jax.vjp     (encoder / info-sharing / decode+loss)
  * flash-attention kernel fwd vs fwd+bwd at trunk shapes (Pallas dq/dkv
    kernel TF/s — the forward kernel's measured ceiling is 64 of a 67 TF/s
    floor, BASELINE.md; this reports where the backward sits)

The reference has no trainer (SURVEY.md §0) — its only training-side
harnesses print module fwd/bwd latency (uniception/models/encoders/utils.py
:11-81, prediction_heads/dpt.py:576-676); this is the TPU-native
whole-training-step budget those can't provide.

Grad consumption note: grad-bearing stages reduce every grad leaf with
vdot(g, g) so XLA cannot dead-code or strength-reduce the backward; that
adds one read of all grads (~1.5 GB, ~2 ms) — the same read the optimizer
performs in the full step.

Usage: python scripts/profile_train.py [--batch 2] [--img 512] [--iters 6]
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
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--scan", type=int, default=0)  # loop layout is the training config (BASELINE.md)
    ap.add_argument("--remat", default="0", choices=["0", "1", "dots", "attn_out", "head"])
    ap.add_argument("--skip-kernels", action="store_true")
    ap.add_argument("--skip-stages", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from uniception_tpu.models.encoders.base import ViTEncoderInput
    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput
    from uniception_tpu.models.utils.config import set_attention_impl, set_gelu_mode
    from uniception_tpu.parallel.training import dust3r_confidence_loss
    from uniception_tpu.utils.profile import benchmark_fn_chained

    set_attention_impl(os.environ.get("BENCH_ATTN", "pallas"))
    set_gelu_mode(os.environ.get("BENCH_GELU", "tanh"))
    if args.remat not in ("0", "1", "head"):
        os.environ["UNICEPTION_TPU_REMAT_POLICY"] = args.remat

    B, IMG = args.batch, args.img
    model = DUSt3R(
        name=f"dust3r_{IMG}_{args.head}",
        img_size=(IMG, IMG),
        patch_embed_cls="ManyAR_PatchEmbed",
        pred_head_type=args.head,
        gradient_checkpointing=args.remat not in ("0", "head"),
        # "head": DPT-head-only remat — the dpt training frontier config
        # (the heads' fp32 full-res activations set the memory boundary)
        head_gradient_checkpointing=True if args.remat == "head" else None,
        scan_blocks=bool(args.scan),
        dtype=jnp.bfloat16,  # bf16 compute, fp32 params
        rngs=nnx.Rngs(0),
    )
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params / 1e6:.1f} M (fp32) | batch {B} | {IMG}px | {args.head} | "
          f"scan={args.scan} remat={args.remat}")

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(B, 3, IMG, IMG).astype(np.float32))
    img2 = jnp.asarray(rng.randn(B, 3, IMG, IMG).astype(np.float32))
    tgt1 = jnp.asarray(rng.randn(B, IMG, IMG, 3).astype(np.float32))
    tgt2 = jnp.asarray(rng.randn(B, IMG, IMG, 3).astype(np.float32))
    ts = jnp.broadcast_to(jnp.asarray([IMG, IMG], jnp.int32), (B, 2))
    ts2 = jnp.concatenate([ts, ts], axis=0)
    imgs = jnp.concatenate([img1, img2], axis=0)
    feat_hw = IMG // 16
    f1 = jnp.asarray(rng.randn(B, 1024, feat_hw, feat_hw).astype(np.float32)).astype(jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(B, 1024, feat_hw, feat_hw).astype(np.float32)).astype(jnp.bfloat16)

    def c_(c, t):
        return (c * 1e-12).astype(t.dtype)

    def consume(tree):
        "DCE/strength-reduction-proof reduction of a grad pytree."
        return sum(jnp.vdot(g, g).astype(jnp.float32) for g in jax.tree.leaves(tree) if hasattr(g, "dtype"))

    def loss_of(params, img1c, img2c):
        m = nnx.merge(graphdef, params, rest)
        r1, r2 = m.forward_pair(img1c, img2c, true_shape1=ts, true_shape2=ts)
        return dust3r_confidence_loss(r1, r2, tgt1, tgt2).astype(jnp.float32)

    # ---- whole-step stages -------------------------------------------------
    def fwd_only(params, opt_state, c):
        return loss_of(params, img1 + c_(c, img1), img2)

    def fwd_bwd(params, opt_state, c):
        loss, grads = jax.value_and_grad(loss_of)(params, img1 + c_(c, img1), img2)
        # 1e-30, not 0.0: XLA's algebraic simplifier folds x*0 and would
        # dead-code the whole backward (the carry*0 hazard in CLAUDE.md)
        return loss + consume(grads) * 1e-30

    def full_step(params, opt_state, c):
        loss, grads = jax.value_and_grad(loss_of)(params, img1 + c_(c, img1), img2)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # consume the whole new opt_state so the moment updates can't be
        # elided (adds a read of the moments the real step also performs as
        # its next-iteration input)
        return loss + consume(new_params) * 1e-30 + consume(opt_state2) * 1e-30

    # optimizer alone: run update+apply on synthetic grads (params * eps)
    def opt_only(params, opt_state, c):
        grads = jax.tree.map(lambda p: p * (1e-12 + c_(c, p)), params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # consume the full opt_state (mu/nu moments, the dominant HBM
        # write of the bandwidth-bound update), not just the count leaf
        return consume(new_params) * 1e-30 + consume(opt_state2) * 1e-30

    stages = {
        "loss forward": fwd_only,
        "fwd+bwd (value_and_grad)": fwd_bwd,
        "full step (+adamw)": full_step,
        "adamw only (synthetic grads)": opt_only,
    }

    # ---- per-stage fwd+bwd -------------------------------------------------
    cot_enc = jnp.asarray(rng.randn(2 * B, 1024, feat_hw, feat_hw).astype(np.float32)).astype(jnp.bfloat16)
    n_tok = feat_hw * feat_hw
    cot_is = jnp.asarray(rng.randn(B, n_tok, 768).astype(np.float32)).astype(jnp.bfloat16)

    def enc_fwd_bwd(params, opt_state, c):
        def f(params, im):
            m = nnx.merge(graphdef, params, rest)
            out = m.encoder(ViTEncoderInput(image=im, data_norm_type=m.data_norm_type, true_shape=ts2))
            return out.features
        y, pull = jax.vjp(f, params, imgs + c_(c, imgs))
        gp, gi = pull(cot_enc.astype(y.dtype))
        return consume(gp) * 1e-30 + jnp.vdot(gi, gi).astype(jnp.float32) * 1e-30

    def is_fwd_bwd(params, opt_state, c):
        def f(params, f1x, f2x):
            m = nnx.merge(graphdef, params, rest)
            out = m.info_sharing(MultiViewTransformerInput(features=[f1x, f2x]))
            final = out[0] if isinstance(out, tuple) else out
            return final.features[0]
        y, pull = jax.vjp(f, params, f1 + c_(c, f1), f2)
        gp, g1, g2 = pull(jnp.transpose(cot_is, (0, 2, 1)).reshape(y.shape).astype(y.dtype))
        return consume(gp) * 1e-30 + jnp.vdot(g1, g1).astype(jnp.float32) * 1e-30

    def decode_loss_fwd_bwd(params, opt_state, c):
        def f(params, f1x, f2x):
            m = nnx.merge(graphdef, params, rest)
            r1, r2 = m._decode_and_predict(f1x, f2x, (IMG, IMG), (IMG, IMG))
            return dust3r_confidence_loss(r1, r2, tgt1, tgt2).astype(jnp.float32)
        loss, pull = jax.vjp(f, params, f1 + c_(c, f1), f2)
        gp, g1, g2 = pull(jnp.float32(1))
        return loss + consume(gp) * 1e-30 + jnp.vdot(g1, g1).astype(jnp.float32) * 1e-30

    if not args.skip_stages:
        stages.update({
            "encoder fwd+bwd (2B imgs)": enc_fwd_bwd,
            "info-sharing fwd+bwd": is_fwd_bwd,
            "decode+heads+loss fwd+bwd": decode_loss_fwd_bwd,
        })

    times = {}
    for name, fn in stages.items():
        sec = benchmark_fn_chained(fn, params, opt_state, iters=args.iters)
        times[name] = sec * 1e3
        print(f"{name:32s} {sec * 1e3:8.2f} ms")

    if not args.skip_stages:
        derived_bwd = times["fwd+bwd (value_and_grad)"] - times["loss forward"]
        derived_opt = times["full step (+adamw)"] - times["fwd+bwd (value_and_grad)"]
        stage_sum = (times["encoder fwd+bwd (2B imgs)"] + times["info-sharing fwd+bwd"]
                     + times["decode+heads+loss fwd+bwd"])
        print(f"{'backward (derived)':32s} {derived_bwd:8.2f} ms")
        print(f"{'optimizer in step (derived)':32s} {derived_opt:8.2f} ms")
        print(f"{'sum of stage fwd+bwd':32s} {stage_sum:8.2f} ms "
              f"(vs whole fwd+bwd {times['fwd+bwd (value_and_grad)']:.2f})")
        print(f"train pairs/s = {B / (times['full step (+adamw)'] / 1e3):.2f}")

    # ---- attention kernel fwd vs bwd --------------------------------------
    if not args.skip_kernels:
        from uniception_tpu.ops.flash_attention import flash_attention

        print("\nflash-attention kernel (Pallas), fwd vs fwd+bwd:")
        for label, (b, n, h, d) in {
            "encoder  B%d N%d H16 D64" % (2 * B, n_tok): (2 * B, n_tok, 16, 64),
            "decoder  B%d N%d H12 D64" % (B, n_tok): (B, n_tok, 12, 64),
        }.items():
            q = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32)).astype(jnp.bfloat16)
            k = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32)).astype(jnp.bfloat16)
            v = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32)).astype(jnp.bfloat16)
            cot = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32)).astype(jnp.bfloat16)

            def fa_fwd(q, k, v, c):
                return flash_attention(q + c_(c, q), k, v).astype(jnp.float32).mean()

            def fa_bwd(q, k, v, c):
                y, pull = jax.vjp(lambda q, k, v: flash_attention(q, k, v), q + c_(c, q), k, v)
                gq, gk, gv = pull(cot)
                return (jnp.vdot(gq, gq) + jnp.vdot(gk, gk) + jnp.vdot(gv, gv)).astype(jnp.float32) * 1e-30

            t_f = benchmark_fn_chained(fa_fwd, q, k, v, iters=20)
            t_b = benchmark_fn_chained(fa_bwd, q, k, v, iters=20)
            mm = 2 * b * h * n * n * d  # FLOPs of one NxNxD matmul pair member
            fwd_tfs = 2 * mm / t_f / 1e12
            # dq kernel: S recompute + dP + dQ (3 matmuls); dkv kernel: S + dP + dV + dK (4)
            bwd_tfs = 7 * mm / (t_b - t_f) / 1e12
            print(f"  {label}: fwd {t_f * 1e3:6.2f} ms ({fwd_tfs:5.1f} TF/s) | "
                  f"fwd+bwd {t_b * 1e3:6.2f} ms | bwd alone {(t_b - t_f) * 1e3:6.2f} ms "
                  f"({bwd_tfs:5.1f} TF/s over 7 matmul-equivs)")


if __name__ == "__main__":
    main()
