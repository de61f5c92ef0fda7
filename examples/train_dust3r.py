#!/usr/bin/env python
"""
End-to-end DUSt3R training example: data pipeline -> sharded train step ->
checkpoint/resume.

The reference ships no trainer (SURVEY.md §0: model-component library only;
its examples run inference, examples/models/dust3r/dust3r.py). This example
shows the TPU-native training loop the rebuild adds, wiring together:

    * uniception_tpu.data.pipeline   — epoch_batches / normalize_batch
      (native C++ fused normalize when available) / prefetch_to_device
      (double-buffered async host->mesh transfer)
    * uniception_tpu.parallel.training — make_train_step over a
      ("data", "model") mesh: dp batch sharding, optional tp (--tp),
      ZeRO-1 optimizer-state sharding (--zero1), FSDP parameter
      sharding (--fsdp), gradient accumulation,
      bf16 compute via --bf16, gradient checkpointing via --remat
    * save_train_state / restore_train_state — full resume (params +
      optimizer moments + step)

Runs out of the box on CPU with a tiny synthetic dataset:

    JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/train_dust3r.py --steps 10 --zero1

Point --img/--depth/... at real sizes (ViT-L: --embed-dim 1024 --depth 24
--heads 16) and replace `synthetic_dataset` with your own (imgs uint8
BHWC + pointmap targets BHWC3) for real training.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def synthetic_dataset(n: int, img: int, seed: int = 0):
    "Random uint8 image pairs + pointmap targets (stand-in for a real set)."
    rng = np.random.RandomState(seed)
    return {
        "img1": rng.randint(0, 256, (n, img, img, 3), np.uint8),
        "img2": rng.randint(0, 256, (n, img, img, 3), np.uint8),
        "pts1": rng.randn(n, img, img, 3).astype(np.float32),
        "pts2": rng.randn(n, img, img, 3).astype(np.float32),
    }


def synthetic_mixed_dataset(n: int, short: int, long: int, seed: int = 0):
    """Mixed landscape/portrait pairs in the ManyAR canvas convention:
    every sample lives in the (short, long) landscape canvas; portrait
    samples (true_shape = (long, short)) are stored spatially transposed,
    and the pointmap TARGETS use the same canvas layout — matching the
    model's landscape_only output convention (see data/bucketing.py)."""
    rng = np.random.RandomState(seed)
    ts = np.where(
        (rng.rand(n) < 0.5)[:, None],
        np.tile([[short, long]], (n, 1)),
        np.tile([[long, short]], (n, 1)),
    ).astype(np.int32)
    return {
        "img1": rng.randint(0, 256, (n, short, long, 3), np.uint8),
        "img2": rng.randint(0, 256, (n, short, long, 3), np.uint8),
        "ts1": ts,
        "ts2": ts,  # both views of a pair share the orientation (typical rig)
        "pts1": rng.randn(n, short, long, 3).astype(np.float32),
        "pts2": rng.randn(n, short, long, 3).astype(np.float32),
    }


def synthetic_flow_dataset(n: int, img: int, seed: int = 0):
    """Random uint8 image pairs + dense-flow targets for ``--model flow``.

    valid: ~10% of pixels are marked invalid (occlusion stand-in) and their
    flow target set to a NaN sentinel — exercising the double-where masking
    in ``flow_confidence_loss`` exactly as real flow datasets (which encode
    occlusions with NaN/inf) would.
    """
    rng = np.random.RandomState(seed)
    flow = rng.randn(n, img, img, 2).astype(np.float32)
    valid = (rng.rand(n, img, img) > 0.1).astype(np.float32)
    flow = np.where(valid[..., None] > 0, flow, np.nan)
    return {
        "img1": rng.randint(0, 256, (n, img, img, 3), np.uint8),
        "img2": rng.randint(0, 256, (n, img, img, 3), np.uint8),
        "flow": flow,
        "valid": valid,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model",
        default="dust3r",
        choices=["dust3r", "flow"],
        help="which composed model to train: dust3r (two-view pointmaps, "
        "confidence loss) or flow (the UFM-style UFMFlow factory, "
        "flow_confidence_loss with an occlusion-valid mask). Resume, "
        "--freeze-encoder, --lora, sharding and remat flags compose for both",
    )
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--embed-dim", type=int, default=64)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--dataset-size", type=int, default=64)
    ap.add_argument("--tp", type=int, default=1, help="model-axis size (tensor parallel)")
    ap.add_argument("--zero1", action="store_true", help="shard optimizer state over the data axis")
    ap.add_argument("--fsdp", action="store_true", help="shard parameters (and moments) over the data axis (ZeRO-3)")
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--head", choices=["linear", "dpt"], default="linear", help="prediction head family")
    ap.add_argument("--remat", action="store_true", help="gradient checkpointing (trunk + heads)")
    ap.add_argument(
        "--head-remat",
        choices=["follow", "on", "off"],
        default="follow",
        help="DPT-head remat override: their fp32 full-res activations, not the "
        "trunk, set the dpt memory boundary (BASELINE.md round-4 dpt ledger)",
    )
    ap.add_argument("--scan", action="store_true", help="scan-over-stacked-blocks layout")
    ap.add_argument("--bf16", action="store_true", help="bf16 compute (fp32 params)")
    ap.add_argument("--mu-bf16", action="store_true", help="bf16 adamw first moment (halves its optimizer HBM traffic)")
    ap.add_argument(
        "--mixed-ar",
        action="store_true",
        help="train on mixed landscape/portrait ManyAR batches (landscape_only=True; "
        "canvas --img x 1.5*--img; true_shapes ride in the batch pytree)",
    )
    ap.add_argument(
        "--norm-loss",
        action="store_true",
        help="scale-invariant loss (DUSt3R norm_mode='avg_dis': preds and gt each normalized by their joint mean distance)",
    )
    ap.add_argument("--clip-grad", type=float, default=None, help="global-norm gradient clipping")
    ap.add_argument(
        "--skip-nonfinite",
        action="store_true",
        help="skip (not apply) any step whose gradients contain NaN/Inf — params and moments stay untouched",
    )
    ap.add_argument(
        "--warmup-cosine",
        type=int,
        default=0,
        metavar="WARMUP_STEPS",
        help="linear-warmup + cosine-decay LR schedule over --steps (peak --lr); 0 = constant LR",
    )
    ap.add_argument(
        "--ema",
        type=float,
        default=0.0,
        metavar="DECAY",
        help="keep an exponential moving average of the params (e.g. 0.999); saved next to the checkpoint",
    )
    ap.add_argument("--metrics", action="store_true", help="log grad_norm each printed step")
    ap.add_argument(
        "--freeze-encoder",
        action="store_true",
        help="freeze the pretrained encoder; train info-sharing + heads only "
        "(the standard UniCeption finetune recipe — skips encoder wgrads and moments)",
    )
    ap.add_argument(
        "--lora",
        type=int,
        default=0,
        metavar="RANK",
        help="LoRA finetuning: wrap the trunk linears with rank-RANK adapters "
        "(nn/lora.py) and train ONLY the adapters (base weights frozen, no "
        "moments allocated for them)",
    )
    ap.add_argument("--ckpt-dir", default="")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--preempt-safe",
        action="store_true",
        help="handle SIGTERM/SIGINT (TPU maintenance/spot preemption) by checkpointing "
        "at the next step boundary and exiting 0; resume with --resume (requires --ckpt-dir)",
    )
    ap.add_argument(
        "--ckpt-every",
        type=int,
        default=0,
        metavar="N",
        help="async-checkpoint every N steps (crash safety; the save overlaps training)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.data.pipeline import DeterministicSampler, normalize_batch, prefetch_to_device
    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.parallel.training import (
        PreemptionGuard,
        dust3r_confidence_loss,
        flow_confidence_loss,
        make_train_step,
        restore_train_state,
        save_train_state,
    )

    if args.preempt_safe and not args.ckpt_dir:
        ap.error("--preempt-safe requires --ckpt-dir (there is nowhere to save on SIGTERM)")
    if args.ckpt_every and not args.ckpt_dir:
        ap.error("--ckpt-every requires --ckpt-dir")
    if args.lora and args.freeze_encoder:
        # pure argument error: reject BEFORE the expensive model construction
        ap.error("--lora and --freeze-encoder are separate finetune recipes; pick one")

    if args.model == "flow" and (args.mixed_ar or args.norm_loss):
        ap.error("--mixed-ar / --norm-loss are DUSt3R-specific (flow has no ManyAR "
                 "convention and no pointmap normalization)")

    canvas = (args.img, args.img * 3 // 2) if args.mixed_ar else (args.img, args.img)
    if args.model == "flow":
        from uniception_tpu.models.factory.flow import UFMFlow

        model = UFMFlow(
            name="train_example_flow",
            img_size=canvas,
            pred_head_type=args.head,
            enc_embed_dim=args.embed_dim,
            enc_depth=args.depth,
            enc_num_heads=args.heads,
            info_sharing_dim=args.embed_dim,
            info_sharing_depth=args.depth,
            info_sharing_num_heads=args.heads,
            gradient_checkpointing=args.remat,
            head_gradient_checkpointing={"follow": None, "on": True, "off": False}[args.head_remat],
            scan_blocks=args.scan,
            dtype=jnp.bfloat16 if args.bf16 else None,
            rngs=nnx.Rngs(0),
        )
    else:
        model = DUSt3R(
            name="train_example",
            img_size=canvas,
            patch_embed_cls="ManyAR_PatchEmbed" if args.mixed_ar else "PatchEmbedDust3R",
            landscape_only=args.mixed_ar,
            pred_head_type=args.head,
            enc_embed_dim=args.embed_dim,
            enc_depth=args.depth,
            enc_num_heads=args.heads,
            info_sharing_dim=args.embed_dim,
            info_sharing_depth=args.depth,
            info_sharing_num_heads=args.heads,
            gradient_checkpointing=args.remat,
            head_gradient_checkpointing={"follow": None, "on": True, "off": False}[args.head_remat],
            scan_blocks=args.scan,
            dtype=jnp.bfloat16 if args.bf16 else None,
            rngs=nnx.Rngs(0),
        )
    trainable = None
    if args.lora:
        from uniception_tpu.nn import apply_lora, lora_trainable

        # standard LoRA recipe: low-rank adapters over the TRUNK linears,
        # heads stay full-rank (min_params=1 within the trunk so the scope
        # is the module boundary, not a size threshold — at ViT-L every
        # trunk linear is large anyway)
        n_wrapped = apply_lora(model.encoder, rank=args.lora, rngs=nnx.Rngs(1), min_params=1)
        n_wrapped += apply_lora(model.info_sharing, rank=args.lora, rngs=nnx.Rngs(2), min_params=1)
        print(f"lora: wrapped {n_wrapped} linears at rank {args.lora}")
        trainable = lora_trainable
    elif args.freeze_encoder:
        trainable = lambda p: not p.startswith("encoder.")

    norm_mode = "avg_dis" if args.norm_loss else None
    loss_fn = None
    if args.model == "flow":
        # step signature is fixed at (params, opt, a, b, t1, t2): the flow
        # target rides t1 and the occlusion-valid mask rides t2
        def loss_fn(m, img1, img2, target_flow, valid):
            out = m.forward_pair(img1, img2)
            return flow_confidence_loss(out, target_flow, valid=valid > 0)
    elif args.mixed_ar:
        # true_shapes ride inside the "image" pytree slots — the step
        # signature is unchanged (its img/target args are arbitrary pytrees)
        def loss_fn(m, v1, v2, target1, target2):
            res1, res2 = m.forward_pair(
                v1["img"], v2["img"], true_shape1=v1["ts"], true_shape2=v2["ts"]
            )
            return dust3r_confidence_loss(res1, res2, target1, target2, norm_mode=norm_mode)
    elif args.norm_loss:
        def loss_fn(m, img1, img2, target1, target2):
            res1, res2 = m.forward_pair(img1, img2)
            return dust3r_confidence_loss(res1, res2, target1, target2, norm_mode="avg_dis")

    if args.warmup_cosine > 0:
        import optax

        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=args.lr,
            warmup_steps=args.warmup_cosine,
            decay_steps=max(args.steps, args.warmup_cosine + 1),
        )
    else:
        lr = args.lr
    ctx, params, opt_state = make_train_step(
        model,
        loss_fn=loss_fn,
        learning_rate=lr,
        model_axis=args.tp,
        use_tp=args.tp > 1,
        grad_accum=args.grad_accum,
        zero1=args.zero1,
        fsdp=args.fsdp,
        mu_dtype=jnp.bfloat16 if args.mu_bf16 else None,
        clip_grad_norm=args.clip_grad,
        skip_nonfinite=args.skip_nonfinite,
        metrics=args.metrics,
        trainable=trainable,
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"mesh={dict(ctx.mesh.shape)} params={n_params / 1e6:.2f}M zero1={args.zero1} fsdp={args.fsdp}")

    start_step = 0
    if args.resume and args.ckpt_dir and os.path.isdir(args.ckpt_dir):
        params, opt_state, start_step = restore_train_state(args.ckpt_dir, params, opt_state)
        # restored arrays come back unsharded (restore_train_state contract)
        # — re-apply the mesh layouts or tp/zero1 silently degrade to
        # full per-device replicas after resume
        from uniception_tpu.parallel.mesh import (
            fsdp_shard_state,
            replicate_state,
            tp_shard_state,
            zero1_shard_state,
        )

        with ctx.mesh:
            params = tp_shard_state(params, ctx.mesh) if args.tp > 1 else replicate_state(params, ctx.mesh)
            if args.fsdp:
                params = fsdp_shard_state(params, ctx.mesh)
            if args.zero1 or args.fsdp:
                opt_state = zero1_shard_state(opt_state, ctx.mesh)
            else:
                opt_state = replicate_state(opt_state, ctx.mesh)
        print(f"resumed from {args.ckpt_dir} at step {start_step}")

    if args.model == "flow":
        data = synthetic_flow_dataset(args.dataset_size, args.img)
    elif args.mixed_ar:
        data = synthetic_mixed_dataset(args.dataset_size, *canvas)
    else:
        data = synthetic_dataset(args.dataset_size, args.img)
    step_idx = start_step
    # step-indexed sampler: the resumed run sees EXACTLY the batches the
    # uninterrupted run would have (data-stream half of bit-exact resume)
    sampler = DeterministicSampler(data, args.batch, seed=1234, start_step=start_step)

    def batches():
        for b in sampler:
            img1 = normalize_batch(b["img1"], "dust3r")
            img2 = normalize_batch(b["img2"], "dust3r")
            if args.model == "flow":
                yield {"img1": img1, "img2": img2, "pts1": b["flow"], "pts2": b["valid"]}
                continue
            if args.mixed_ar:
                img1 = {"img": img1, "ts": b["ts1"]}
                img2 = {"img": img2, "ts": b["ts2"]}
            yield {"img1": img1, "img2": img2, "pts1": b["pts1"], "pts2": b["pts2"]}

    ema = None
    if args.ema > 0:
        from uniception_tpu.parallel.training import ema_init, ema_update

        ema = ema_init(params)

    guard = PreemptionGuard() if args.preempt_safe else None
    pending = None  # in-flight async checkpointer (barrier before the next save / exit)

    def checkpoint(wait: bool):
        nonlocal pending
        if pending is not None:
            pending.wait_until_finished()
        pending = save_train_state(os.path.abspath(args.ckpt_dir), params, opt_state, step=step_idx, wait=wait)

    preempted = False
    with ctx.mesh:
        t0 = time.perf_counter()
        for batch in prefetch_to_device(batches(), ctx.mesh):
            out = ctx.step(
                params, opt_state, batch["img1"], batch["img2"], batch["pts1"], batch["pts2"]
            )
            if args.metrics:
                loss, aux, params, opt_state = out
            else:
                loss, params, opt_state = out
            if ema is not None:
                ema = ema_update(ema, params, args.ema)
            step_idx += 1
            if step_idx % max(1, args.steps // 10) == 0 or step_idx == start_step + 1:
                extra = f"  grad_norm {float(aux['grad_norm']):8.3f}" if args.metrics else ""
                print(
                    f"step {step_idx:5d}  loss {float(loss):9.4f}  {(time.perf_counter() - t0):6.1f}s{extra}",
                    flush=True,
                )
            if guard is not None and guard.should_stop():
                # finish-the-step-then-save: params/opt_state here are the
                # post-update buffers, so the resumed run continues exactly
                # where the uninterrupted one would be at step_idx
                checkpoint(wait=True)
                print(f"preempted: saved at step {step_idx}; resume with --resume", flush=True)
                preempted = True
                break
            if step_idx >= start_step + args.steps:
                break
            if args.ckpt_every and (step_idx - start_step) % args.ckpt_every == 0:
                checkpoint(wait=False)

    if args.ckpt_dir and not preempted:
        checkpoint(wait=True)
        if ema is not None:
            save_train_state(os.path.abspath(args.ckpt_dir) + "_ema", ema, step=step_idx)
        print(f"saved params+opt_state+step to {args.ckpt_dir} (resume with --resume)")


if __name__ == "__main__":
    main()
