"""
End-to-end DUSt3R serving loop: uint8 staging -> on-device normalization ->
jitted two-view inference.

Demonstrates the production input path (SURVEY.md §2.8 — the reference has
no loader; this is the TPU-serving equivalent):

    uint8 frames (B, H, W, 3)
      -> prefetch_to_device                  (async DMA, 2 deep, uint8 = 4x
                                              fewer link bytes than f32)
      -> normalize + transpose on device     (VPU, fused into the jit)
      -> DUSt3R.forward_pair                 (bf16 trunk, Pallas attention)

For hosts co-located with the chips, `uniception_tpu.data.normalize_batch`
(single-pass C++) is the host-side alternative — preprocess there when the
host is idle and the PCIe link is wide; normalize on device when frames
arrive over a narrow link (this environment's axon tunnel, or DCN).

Cold-start ladder (each step subsumes the previous):
    --checkpoint m.nsv                        native ckpt: no host transforms
    ... --compile-cache DIR                   warm restarts skip the compile
    ... --save-artifact m.jexp  (build once)  then
    --artifact m.jexp --checkpoint m.nsv      no construction, no trace

Usage:
    python examples/serve_dust3r.py                      # synthetic frames
    python examples/serve_dust3r.py --img-size 224 --batch 2 --pairs 8
    python examples/serve_dust3r.py --checkpoint ckpt.pth --image-dir frames/
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--model",
        default="dust3r",
        choices=["dust3r", "flow"],
        help="which composed model to serve: dust3r (two-view pointmaps) or flow "
        "(the UFM-style UFMFlow factory — dense flow + confidence). Every serving "
        "feature composes for both: native .nsv checkpoints (convert_checkpoints.py "
        "--serving --model flow), --int8/--gptq, --buckets, --compile-cache, "
        "--save-artifact/--artifact",
    )
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--batch", type=int, default=2, help="pairs per device batch")
    p.add_argument("--pairs", type=int, default=8, help="total pairs to run")
    p.add_argument("--checkpoint", default=None, help="UniCeption-format DUSt3R .pth/.npz")
    p.add_argument("--image-dir", default=None, help="directory of frames; consecutive frames are paired")
    p.add_argument("--head", default="linear", choices=["linear", "dpt"])
    p.add_argument("--enc-depth", type=int, default=24)
    p.add_argument("--enc-dim", type=int, default=1024)
    p.add_argument("--enc-heads", type=int, default=16)
    p.add_argument("--dec-depth", type=int, default=12)
    p.add_argument("--dec-dim", type=int, default=768)
    p.add_argument("--dec-heads", type=int, default=12)
    p.add_argument("--int8", action="store_true", help="w8a8-quantize the trunk linears (production serving config)")
    p.add_argument(
        "--int8-policy",
        default="all",
        help="(--int8) mixed-precision trunk policy (nn/quant.py trunk_policy grammar)",
    )
    p.add_argument(
        "--gptq",
        default=None,
        help="(--int8) npz of calibrated GPTQ codes (scripts/calibrate_gptq.py) — "
        "overwrites the RTN integer codes at zero serving cost",
    )
    p.add_argument(
        "--int8-asym",
        default="none",
        help="(--int8) which quantized layers use zero-point activation quant "
        "(same grammar; default all-symmetric — the measured frontier default)",
    )
    p.add_argument(
        "--buckets",
        action="store_true",
        help="serve arbitrary-size pairs via aspect bucketing (data/bucketing.py): "
        "each pair is resized into its best-aspect canvas from the DUSt3R-512 "
        "family (scaled to --img-size), every bucket compiles exactly once, "
        "portrait views ride the ManyAR true_shape convention",
    )
    p.add_argument("--no-scan", action="store_true", help="use the loop layout instead of scan-over-stacked-blocks")
    p.add_argument(
        "--compile-cache",
        default=None,
        metavar="DIR",
        help="persistent XLA compilation cache: warm restarts skip the jit compile entirely (utils/compile_cache.py)",
    )
    p.add_argument(
        "--save-artifact",
        default=None,
        metavar="PATH",
        help="export the serving computation to an AOT artifact (utils/export.py) and exit; "
        "serve it later with --artifact (pair it with a native serving checkpoint for the weights)",
    )
    p.add_argument(
        "--artifact",
        default=None,
        metavar="PATH",
        help="serve from an AOT artifact: no model construction, no Python trace — "
        "requires --checkpoint to be a native serving checkpoint (.nsv)",
    )
    return p.parse_args()


def load_frames(args):
    "Returns uint8 (N, H, W, 3)."
    if args.image_dir:
        from PIL import Image

        files = sorted(
            os.path.join(args.image_dir, f)
            for f in os.listdir(args.image_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        frames = [
            np.asarray(Image.open(f).convert("RGB").resize((args.img_size, args.img_size)))
            for f in files
        ]
        return np.stack(frames)
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, size=(2 * args.pairs, args.img_size, args.img_size, 3), dtype=np.uint8)


def _make_model(args, img_size=None, landscape_only=False):
    "Plain constructor for the serving model (shared by the square and bucketed paths)."
    import jax.numpy as jnp
    from flax import nnx

    if args.model == "flow":
        from uniception_tpu.models.factory.flow import UFMFlow

        # no ManyAR/landscape_only: flow serving buckets carry orientation in
        # the canvas itself (data/bucketing.py manyar=False)
        return UFMFlow(
            name="ufm_flow_serve",
            img_size=img_size or (args.img_size, args.img_size),
            pred_head_type=args.head,
            enc_embed_dim=args.enc_dim,
            enc_depth=args.enc_depth,
            enc_num_heads=args.enc_heads,
            info_sharing_dim=args.dec_dim,
            info_sharing_depth=args.dec_depth,
            info_sharing_num_heads=args.dec_heads,
            scan_blocks=not args.no_scan,
            dtype=jnp.bfloat16,
            rngs=nnx.Rngs(0),
        )

    from uniception_tpu.models.factory.dust3r import DUSt3R

    return DUSt3R(
        name="dust3r_serve",
        img_size=img_size or (args.img_size, args.img_size),
        landscape_only=landscape_only,
        patch_embed_cls="ManyAR_PatchEmbed",
        pred_head_type=args.head,
        enc_embed_dim=args.enc_dim,
        enc_depth=args.enc_depth,
        enc_num_heads=args.enc_heads,
        info_sharing_dim=args.dec_dim,
        info_sharing_depth=args.dec_depth,
        info_sharing_num_heads=args.dec_heads,
        # scan layout: 6x faster compiles and the fastest measured serving
        # configuration (BASELINE.md); --no-scan restores the loop layout
        scan_blocks=not args.no_scan,
        dtype=jnp.bfloat16,
        rngs=nnx.Rngs(0),
    )


def _build_model(args, img_size=None, landscape_only=False):
    "Construct + load + (maybe) quantize the serving model; returns (graphdef, state)."
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.utils.config import fast_init

    def ctor():
        return _make_model(args, img_size=img_size, landscape_only=landscape_only)

    if args.checkpoint is not None:
        # Cold-start path (utils/coldstart.py): abstract construction (no
        # initializer dispatch at all), then ONE batched transfer + on-device
        # bf16 cast. Native serving checkpoints (convert_checkpoints.py
        # --serving) additionally skip all host-side layout transforms.
        # Measured vs the eager construct-then-load path on the tunnel
        # backend: see BASELINE.md serving cold-start table.
        from uniception_tpu.utils.coldstart import (
            abstract_construct,
            is_native_state,
            load_native_state,
            materialize,
        )

        pre_quantized = False
        if is_native_state(args.checkpoint):
            arrays, ckpt_meta = load_native_state(args.checkpoint)
            pre_quantized = ckpt_meta.get("quant") is not None
            if pre_quantized:
                # offline-quantized serving checkpoint (convert_checkpoints.py
                # --serving --int8): construct the Int8Linear module tree
                # abstractly (quantize math traces inside eval_shape, nothing
                # executes) and fill it straight from the int8 arrays
                from uniception_tpu.nn.quant import quantize_trunk

                # the module tree must match the stored arrays exactly:
                # policy decides which layers are Int8Linear, asym which of
                # those carry w_colsum. Old (round-3) checkpoints predate
                # the keys -> all-layer symmetric, their exact layout.
                q_policy = ckpt_meta.get("quant_policy", "all")
                q_asym = ckpt_meta.get("quant_asym", "none")
                args._quant_spec = (q_policy, q_asym)

                def ctor_q():
                    m = ctor()
                    quantize_trunk(m, q_policy, asym=q_asym)
                    return m

                model = abstract_construct(ctor_q)
                if not args.int8:
                    print(f"checkpoint is {ckpt_meta['quant']}-quantized; serving int8")
            else:
                model = abstract_construct(ctor)
            model = materialize(model, arrays=arrays, param_dtype=jnp.bfloat16)
        else:
            model = abstract_construct(ctor)
            from uniception_tpu.utils.checkpoint import load_checkpoint
            from uniception_tpu.utils.torch_compat import load_torch_state_dict

            ckpt = load_checkpoint(args.checkpoint)
            load_torch_state_dict(
                model, ckpt["model"], ignore=model.checkpoint_alias_patterns(), to_device=False
            )
            model = materialize(model, param_dtype=jnp.bfloat16)
        graphdef, state = nnx.split(model)
    else:
        # random-weight demo mode keeps the real eager init
        pre_quantized = False
        with fast_init(False):
            model = ctor()
        graphdef, state = nnx.split(model)
        state = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state)
    if args.int8 and not pre_quantized:
        from uniception_tpu.nn.quant import quantize_trunk

        model = nnx.merge(graphdef, state)
        n_q = quantize_trunk(model, args.int8_policy, asym=args.int8_asym)
        args._quant_spec = (args.int8_policy, args.int8_asym)
        print(f"int8-quantized {n_q} trunk linears (policy={args.int8_policy}, asym={args.int8_asym})")
        graphdef, state = nnx.split(model)
    if args.gptq:
        # calibrated GPTQ codes (scripts/calibrate_gptq.py): same kernels and
        # scales as RTN, better integer codes — zero serving cost
        if not (args.int8 or pre_quantized):
            raise SystemExit("--gptq requires an int8-quantized model (--int8 or a quantized checkpoint)")
        from uniception_tpu.nn.gptq import apply_gptq, load_gptq_npz

        model = nnx.merge(graphdef, state)
        n_g = apply_gptq(model, load_gptq_npz(args.gptq))
        print(f"GPTQ codes applied to {n_g} layers from {args.gptq}")
        graphdef, state = nnx.split(model)
    return graphdef, state


def _scaled_buckets(img_size, patch=16):
    """DUSt3R-512 aspect family scaled to img_size, snapped to multiples of
    the model's patch size with a floor of 2 patch rows/cols per canvas (a
    1-patch-tall canvas degenerates the DPT pyramid and the aspect family)."""
    from uniception_tpu.data.bucketing import DUST3R_512_BUCKETS

    if img_size == 512 and all(h % patch == 0 and w % patch == 0 for h, w in DUST3R_512_BUCKETS):
        return DUST3R_512_BUCKETS
    lo = 2 * patch
    out = []
    for h, w in DUST3R_512_BUCKETS:
        s = img_size / 512.0
        hw = (max(lo, int(round(h * s / patch)) * patch), max(lo, int(round(w * s / patch)) * patch))
        if hw[0] <= hw[1] and hw not in out:  # keep landscape canvases only
            out.append(hw)
    return tuple(out)


def serve_bucketed(args):
    """Arbitrary-resolution serving: pairs stream through PairBucketedBatcher
    into a fixed family of aspect canvases; each bucket is one static-shape
    jit (compiled exactly once), portrait views ride ManyAR true_shapes.

    One loaded state serves every bucket — DUSt3R params are shape-
    independent of img_size; only the per-bucket graphdef (a structure-only
    abstract construction, no weights) differs.
    """
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.encoders.image_normalizations import IMAGE_NORMALIZATION_DICT
    from uniception_tpu.models.utils.config import set_attention_impl
    from uniception_tpu.utils.coldstart import abstract_construct
    from uniception_tpu.utils.pytree import state_paths

    set_attention_impl("pallas")
    if args.compile_cache:
        from uniception_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)

    buckets = _scaled_buckets(args.img_size)
    if args.model == "flow":
        # flow has no ManyAR packing: portrait pairs get their own transposed
        # canvases instead of riding the landscape canvas rotated
        from uniception_tpu.data.bucketing import with_portrait_buckets

        buckets = with_portrait_buckets(buckets)

    norm = IMAGE_NORMALIZATION_DICT["dust3r"]
    mean = jnp.asarray(norm.mean).reshape(1, 3, 1, 1)
    std = jnp.asarray(norm.std).reshape(1, 3, 1, 1)

    def _bucket_artifact_path(base, hw):
        root, ext = os.path.splitext(base)
        return f"{root}.{hw[0]}x{hw[1]}{ext or '.jexp'}"

    def serving_fn_bucket(m, c1, c2, t1, t2):
        def prep(u8):
            x = jnp.transpose(u8, (0, 3, 1, 2)).astype(jnp.float32) / 255.0
            return (x - mean) / std

        if args.model == "flow":
            # true_shape == canvas shape by construction (manyar=False);
            # the args stay in the signature so both models share the loop
            r = m.forward_pair(prep(c1), prep(c2))
            return r["flow"], r["flow_conf"]
        r1, r2 = m.forward_pair(prep(c1), prep(c2), true_shape1=t1, true_shape2=t2)
        return r1["pts3d"], r1["conf"], r2["pts3d_in_other_view"], r2["conf"]

    if args.artifact is not None:
        # per-bucket AOT path: one artifact per canvas shape (AOT is per-shape
        # by nature), all bound to ONE native checkpoint's arrays
        from uniception_tpu.utils.coldstart import is_native_state, load_native_state
        from uniception_tpu.utils.export import load_serving_artifact

        if not (args.checkpoint and is_native_state(args.checkpoint)):
            raise SystemExit("--artifact requires --checkpoint to be a native serving checkpoint "
                             "(scripts/convert_checkpoints.py --serving)")
        t0 = time.perf_counter()
        arrays, _ = load_native_state(args.checkpoint)
        state = None
        infer_cache = {}
        for hw in buckets:
            bound = load_serving_artifact(_bucket_artifact_path(args.artifact, hw)).bind(arrays)
            infer_cache[hw] = (lambda b: lambda state, c1, c2, t1, t2: b(c1, c2, t1, t2))(bound)
        print(f"{len(buckets)} per-bucket AOT artifacts bound in {time.perf_counter() - t0:.2f}s "
              f"(no construction, no trace)")

        def get_infer(hw):
            return infer_cache[hw]

        return _bucket_loop(args, buckets, state, get_infer)

    graphdef, state = _build_model(args, img_size=buckets[0], landscape_only=args.model == "dust3r")
    # _build_model records the exact (policy, asym) it quantized with (online
    # flagged or from checkpoint metadata) so every per-bucket graphdef
    # reconstructs the same Int8Linear/w_colsum layout
    quant_spec = getattr(args, "_quant_spec", None)
    int8_active = quant_spec is not None  # set by _build_model iff the trunk was quantized

    def graphdef_for(hw):
        if hw == buckets[0]:
            return graphdef

        def ctor_b():
            m = _make_model(args, img_size=hw, landscape_only=True)
            if quant_spec is not None:
                from uniception_tpu.nn.quant import quantize_trunk

                quantize_trunk(m, quant_spec[0], asym=quant_spec[1])
            return m

        gd, _ = nnx.split(abstract_construct(ctor_b))
        return gd

    if args.save_artifact is not None:
        # one AOT artifact per bucket shape, all sharing the same weights
        # (shipped separately via the native checkpoint)
        from uniception_tpu.utils.export import save_serving_artifact

        for hw in buckets:
            m = nnx.merge(graphdef_for(hw), state)
            u8 = jax.ShapeDtypeStruct((args.batch, hw[0], hw[1], 3), jnp.uint8)
            tsp = jax.ShapeDtypeStruct((args.batch, 2), jnp.int32)
            p = _bucket_artifact_path(args.save_artifact, hw)
            save_serving_artifact(
                p, m, (u8, u8, tsp, tsp), method=serving_fn_bucket,
                bucket=list(hw), batch=args.batch, head=args.head, int8=int8_active,
                model_name=args.model,
            )
            print(f"bucket {hw}: artifact written to {p}")
        print(f"{len(buckets)} per-bucket serving artifacts "
              f"(pair with a native --serving checkpoint; serve with --buckets --artifact)")
        return

    infer_cache = {}

    def get_infer(hw):
        if hw not in infer_cache:
            gd = graphdef_for(hw)

            @jax.jit
            def infer_b(state, c1, c2, t1, t2):
                return serving_fn_bucket(nnx.merge(gd, state), c1, c2, t1, t2)

            infer_cache[hw] = infer_b
        return infer_cache[hw]

    return _bucket_loop(args, buckets, state, get_infer)


def _bucket_loop(args, buckets, state, get_infer):
    "Pre-warm every bucket, then stream a mixed-size pair load through the batcher."
    import jax
    import jax.numpy as jnp

    from uniception_tpu.data.bucketing import PairBucketedBatcher, extract_view

    # pre-warm every bucket (each compiles exactly once; with --compile-cache
    # warm restarts skip even that)
    t0 = time.perf_counter()
    for hw in buckets:
        z = jnp.zeros((args.batch, hw[0], hw[1], 3), jnp.uint8)
        ts = jnp.broadcast_to(jnp.asarray(hw, jnp.int32), (args.batch, 2))
        jax.block_until_ready(get_infer(hw)(state, z, z, ts, ts))
    print(f"{len(buckets)} buckets pre-warmed in {time.perf_counter() - t0:.1f}s: {list(buckets)}")

    # request stream: native-size frames from --image-dir (consecutive frames
    # pair up), or synthetic mixed sizes/orientations around img_size
    def pair_stream():
        if args.image_dir:
            from PIL import Image

            files = sorted(
                os.path.join(args.image_dir, f)
                for f in os.listdir(args.image_dir)
                if f.lower().endswith((".png", ".jpg", ".jpeg"))
            )
            for i in range(len(files) // 2):
                a = np.asarray(Image.open(files[2 * i]).convert("RGB"))
                b = np.asarray(Image.open(files[2 * i + 1]).convert("RGB"))
                yield i, a, b
            return
        rng = np.random.RandomState(0)
        for i in range(args.pairs):
            ar = [1.33, 1.52, 1.78, 2.0, 3.2][i % 5]
            h = rng.randint(args.img_size // 2, 2 * args.img_size)
            w = int(h * ar)
            if i % 3 == 2:  # every third request is portrait
                h, w = w, h
            img1 = rng.randint(0, 256, (h, w, 3), np.uint8)
            img2 = rng.randint(0, 256, (h, w, 3), np.uint8) if i % 4 else np.swapaxes(
                rng.randint(0, 256, (w, h, 3), np.uint8), 0, 1
            )
            yield i, img1, img2

    batcher = PairBucketedBatcher(args.batch, buckets, manyar=args.model != "flow")
    t0 = time.perf_counter()
    served = 0
    per_bucket = {}

    def run_batch(emitted):
        nonlocal served
        for hw, c1, c2, t1, t2, meta in emitted:
            out = get_infer(hw)(state, jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(t1), jnp.asarray(t2))
            served += meta["n_valid"]
            per_bucket[hw] = per_bucket.get(hw, 0) + meta["n_valid"]
            last = (out, np.asarray(t2), meta)
            run_batch.last = last

    for i, img1, img2 in pair_stream():
        run_batch(batcher.add(img1, img2, key=i))
    run_batch(batcher.flush())
    if served == 0:
        print("no pairs to serve (need >= 2 frames in --image-dir)")
        return
    out, t2_np, meta = run_batch.last
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{served} pairs in {dt:.2f}s = {served / dt:.2f} pairs/s across "
          f"{len(per_bucket)} buckets {dict((str(k), v) for k, v in per_bucket.items())}")
    if args.model == "flow":
        print("flow:", tuple(np.asarray(out[0][0]).shape), "conf:", tuple(np.asarray(out[1][0]).shape))
    else:
        # native-orientation unpack of the last batch's second view
        native = extract_view(np.asarray(out[2][0]), t2_np[0])
        print("pts3d (native orientation):", native.shape)


def main():
    args = parse_args()
    if args.gptq and args.artifact:
        # the AOT path binds checkpoint arrays directly and never calls
        # _build_model, so --gptq would be silently ignored: the codes must
        # already live in the checkpoint for artifact serving
        raise SystemExit(
            "--gptq cannot be applied at serve time on the --artifact path; embed the "
            "codes in the serving checkpoint instead (convert_checkpoints.py --serving "
            "--int8 --gptq codes.npz) — they then ride the bound arrays automatically"
        )
    if args.buckets:
        return serve_bucketed(args)
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.data.pipeline import prefetch_to_device
    from uniception_tpu.models.utils.config import set_attention_impl

    set_attention_impl("pallas")
    if args.compile_cache:
        from uniception_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)

    from uniception_tpu.models.encoders.image_normalizations import IMAGE_NORMALIZATION_DICT

    norm = IMAGE_NORMALIZATION_DICT["dust3r"]
    mean = jnp.asarray(norm.mean).reshape(1, 3, 1, 1)
    std = jnp.asarray(norm.std).reshape(1, 3, 1, 1)

    def serving_fn(m, img1_u8, img2_u8, ts):
        "uint8 staging + on-device normalize + two-view forward (the served graph)."

        def prep(u8):
            # normalize on device: the host->device link carries uint8 HWC
            # (4x fewer bytes than f32) and the cast/normalize rides the VPU
            x = jnp.transpose(u8, (0, 3, 1, 2)).astype(jnp.float32) / 255.0
            return (x - mean) / std

        if args.model == "flow":
            r = m.forward_pair(prep(img1_u8), prep(img2_u8))
            return r["flow"], r["flow_conf"]
        r1, r2 = m.forward_pair(prep(img1_u8), prep(img2_u8), true_shape1=ts, true_shape2=ts)
        return r1["pts3d"], r1["conf"], r2["pts3d_in_other_view"], r2["conf"]

    ts = jnp.broadcast_to(jnp.asarray([args.img_size, args.img_size], jnp.int32), (args.batch, 2))

    if args.artifact is not None:
        # AOT path (utils/export.py): the serving process constructs nothing
        # and traces nothing — deserialize the exported computation, feed
        # param leaves straight from the native checkpoint.
        from uniception_tpu.utils.coldstart import is_native_state, load_native_state
        from uniception_tpu.utils.export import load_serving_artifact

        if not (args.checkpoint and is_native_state(args.checkpoint)):
            raise SystemExit("--artifact requires --checkpoint to be a native serving checkpoint "
                             "(scripts/convert_checkpoints.py --serving)")
        t0 = time.perf_counter()
        art = load_serving_artifact(args.artifact)
        arrays, _ = load_native_state(args.checkpoint)
        bound = art.bind(arrays)
        state = None

        def infer(_state, img1_u8, img2_u8, ts):
            return bound(img1_u8, img2_u8, ts)

        print(f"AOT artifact bound in {time.perf_counter() - t0:.2f}s (no construction, no trace)")
    else:
        graphdef, state = _build_model(args)

        if args.save_artifact is not None:
            from uniception_tpu.utils.export import save_serving_artifact

            model = nnx.merge(graphdef, state)
            u8_spec = jax.ShapeDtypeStruct((args.batch, args.img_size, args.img_size, 3), jnp.uint8)
            ts_spec = jax.ShapeDtypeStruct((args.batch, 2), jnp.int32)
            save_serving_artifact(
                args.save_artifact, model, (u8_spec, u8_spec, ts_spec), method=serving_fn,
                img_size=args.img_size, batch=args.batch, head=args.head, int8=bool(args.int8),
                model_name=args.model,
            )
            print(f"serving artifact written to {args.save_artifact} "
                  f"(pair with a native --serving checkpoint; serve with --artifact)")
            return

        @jax.jit
        def infer(state, img1_u8, img2_u8, ts):
            m = nnx.merge(graphdef, state)
            return serving_fn(m, img1_u8, img2_u8, ts)

    frames = load_frames(args)
    n_pairs = len(frames) // 2

    def host_batches():
        for i in range(0, n_pairs - (n_pairs % args.batch), args.batch):
            yield {
                "img1": frames[2 * i : 2 * (i + args.batch) : 2],
                "img2": frames[2 * i + 1 : 2 * (i + args.batch) : 2],
            }

    # warm-up compile
    first = next(iter(host_batches()))
    jax.block_until_ready(infer(state, jnp.asarray(first["img1"]), jnp.asarray(first["img2"]), ts))

    t0 = time.perf_counter()
    done = 0
    for batch in prefetch_to_device(host_batches()):
        out = infer(state, batch["img1"], batch["img2"], ts)
        done += args.batch
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{done} pairs in {dt:.2f}s = {done / dt:.2f} pairs/s (incl. host preprocessing + staging)")
    if args.model == "flow":
        print("flow:", out[0].shape, "flow_conf:", out[1].shape)
    else:
        print("pts3d:", out[0].shape, "conf:", out[1].shape)


if __name__ == "__main__":
    main()
