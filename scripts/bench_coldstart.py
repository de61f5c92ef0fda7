"""
Serving cold-start benchmark: time-to-weights-on-device for DUSt3R ViT-L.

The reference's load path (torch.load + load_state_dict after an eager
module construction — reference: uniception/models/encoders/croco.py:99-111)
maps on a TPU host to: eager construct (one dispatch per initializer op)
+ per-leaf host->device transfers. Through this environment's remote
tunnel both are latency-bound. `uniception_tpu/utils/coldstart.py`
replaces them with abstract (eval_shape) construction + ONE batched
device_put. This script measures each stage in isolation; each mode is
meant to run in its OWN process (backend init is warmed up and excluded).

Usage:
    # one-time: write serving checkpoints (random weights, CPU backend ok)
    JAX_PLATFORM_NAME=cpu python scripts/bench_coldstart.py --make /tmp/cold

    # then, one fresh process per mode (TPU):
    python scripts/bench_coldstart.py --mode eager
    python scripts/bench_coldstart.py --mode native --ckpt /tmp/cold/serve_bf16.nsv
    python scripts/bench_coldstart.py --mode native --ckpt /tmp/cold/serve_bf16.npz
    python scripts/bench_coldstart.py --mode torch  --ckpt /tmp/cold/torch.npz

Modes:
    eager   fast_init eager construct + on-host bf16 cast (round-3 #6 baseline)
    native  abstract_construct + load_native_state + materialize(bf16)
    torch   abstract_construct + load_checkpoint + load_torch_state_dict(
            to_device=False) + materialize(bf16)  (torch-layout interchange)
    artifact  load_serving_artifact + load_native_state + bind + ONE forward
            (utils/export.py AOT path: no construction, no Python trace)

--first-result extends eager/native/torch with jit(forward_pair) + one
forward so they are comparable to the artifact mode's time-to-first-
inference (the artifact mode always measures through the first result).
Pair any mode with --compile-cache DIR and run it twice to split the
XLA-compile share out of the cold start.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import uniception_tpu  # noqa: F401  (re-asserts JAX_PLATFORMS env over the sitecustomize force-set)

CFG = dict(
    name="dust3r_serve",
    img_size=(512, 512),
    patch_embed_cls="ManyAR_PatchEmbed",
    pred_head_type="linear",
    enc_embed_dim=1024,
    enc_depth=24,
    enc_num_heads=16,
    scan_blocks=True,
)


def build(rngs, dtype):
    from uniception_tpu.models.factory.dust3r import DUSt3R

    return DUSt3R(dtype=dtype, rngs=rngs, **CFG)


def fence(state):
    """Force real completion: on the tunnel backend ``block_until_ready`` may
    return before un-fetched results actually exist (CLAUDE.md quirk), so
    fetch one element from a spread of leaves (incl. the largest) — each
    fetch is a host round trip that cannot complete before the transfer has."""
    import jax
    import numpy as np

    leaves = [
        l
        for l in jax.tree.leaves(state)
        if hasattr(l, "dtype") and not jax.dtypes.issubdtype(l.dtype, jax.dtypes.prng_key)
    ]
    sample = {0, len(leaves) // 2, len(leaves) - 1, int(np.argmax([l.size for l in leaves]))}
    for i in sorted(sample):
        np.asarray(leaves[i].reshape(-1)[:1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--make", default=None, help="write serving+torch checkpoints (and the AOT artifact) into this dir and exit")
    p.add_argument("--mode", choices=["eager", "native", "torch", "artifact"], default="eager")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--artifact-path", default=None, help="(mode=artifact) .jexp file from --make")
    p.add_argument("--batch", type=int, default=2, help="serving batch (pairs); must match the artifact's")
    p.add_argument(
        "--first-result",
        action="store_true",
        help="extend eager/native/torch through jit + one forward (comparable to mode=artifact)",
    )
    p.add_argument(
        "--compile-cache",
        default=None,
        metavar="DIR",
        help="persistent XLA compilation cache; run the same mode twice to measure a warm restart",
    )
    args = p.parse_args()

    if args.compile_cache:
        from uniception_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)

    import jax
    import jax.numpy as jnp
    from flax import nnx

    # warm up backend init / tunnel handshake — excluded from timings
    jax.block_until_ready(jnp.zeros(()) + 1)

    if args.make:
        os.makedirs(args.make, exist_ok=True)
        from uniception_tpu.models.utils.config import fast_init
        from uniception_tpu.utils.checkpoint import save_checkpoint
        from uniception_tpu.utils.coldstart import save_native_state
        from uniception_tpu.utils.torch_compat import state_dict_from_module

        with fast_init(False):
            model = build(nnx.Rngs(0), jnp.bfloat16)
        save_native_state(os.path.join(args.make, "serve_bf16.nsv"), model, dtype=jnp.bfloat16)
        save_native_state(os.path.join(args.make, "serve_bf16.npz"), model, dtype=jnp.bfloat16)
        save_checkpoint(os.path.join(args.make, "torch.npz"), state_dict_from_module(model))
        from uniception_tpu.utils.export import save_serving_artifact

        # the artifact's param calling convention must match the bf16 native
        # checkpoint it will be served with: cast before exporting
        _, st = nnx.split(model)
        st = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if getattr(x, "dtype", None) == jnp.float32 else x, st
        )
        nnx.update(model, st)
        # trace-time kernel routing: run --make ON the serving backend so the
        # artifact embeds the Pallas lowerings (utils/export.py caveat)
        spec = jax.ShapeDtypeStruct((args.batch, 3, *CFG["img_size"]), jnp.float32)
        save_serving_artifact(os.path.join(args.make, "serve.jexp"), model, (spec, spec))
        print(f"wrote {args.make}/serve_bf16.{{nsv,npz}}, {args.make}/torch.npz, {args.make}/serve.jexp (b{args.batch})")
        return

    t0 = time.perf_counter()
    if args.mode == "artifact":
        import numpy as np

        from uniception_tpu.utils.coldstart import load_native_state
        from uniception_tpu.utils.export import load_serving_artifact

        art = load_serving_artifact(args.artifact_path)
        arrays, _ = load_native_state(args.ckpt)
        t_load = time.perf_counter() - t0
        fn = art.bind(arrays)
        img = jnp.zeros(tuple(art.header["input_specs"][0][0]), jnp.float32)
        out = fn(img, img)
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])  # fence (see fence())
        dt = time.perf_counter() - t0
        print(f"  load(artifact+ckpt): {t_load:.2f}s")
        print(
            f"mode=artifact: {dt:.2f}s to FIRST RESULT "
            f"({len(art.param_paths)} param leaves, backend={jax.default_backend()})"
        )
        return

    if args.mode == "eager":
        from uniception_tpu.models.utils.config import fast_init

        with fast_init(True):
            model = build(nnx.Rngs(0), jnp.bfloat16)
        _, state = nnx.split(model)
        state = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state)
        jax.block_until_ready(jax.tree.leaves(state))
        fence(state)
    else:
        from uniception_tpu.utils.coldstart import abstract_construct, load_native_state, materialize

        if args.mode == "native":
            arrays, ckpt_meta = load_native_state(args.ckpt)
            t_load = time.perf_counter() - t0  # nsv: ~0, bytes stream during transfer

            def thunk():
                m = build(nnx.Rngs(0), jnp.bfloat16)
                if ckpt_meta.get("quant"):  # offline-int8 serving checkpoint
                    from uniception_tpu.nn.quant import quantize_linears

                    quantize_linears(m.encoder)
                    quantize_linears(m.info_sharing)
                return m

            model = abstract_construct(thunk)
            t_construct = time.perf_counter() - t0 - t_load
            model = materialize(model, arrays=arrays, param_dtype=jnp.bfloat16, verbose=True)
        else:
            from uniception_tpu.utils.checkpoint import load_checkpoint
            from uniception_tpu.utils.torch_compat import load_torch_state_dict

            model = abstract_construct(lambda: build(nnx.Rngs(0), jnp.bfloat16))
            t_construct = time.perf_counter() - t0
            ckpt = load_checkpoint(args.ckpt)
            t_load = time.perf_counter() - t0 - t_construct
            load_torch_state_dict(
                model, ckpt["model"], ignore=model.checkpoint_alias_patterns(), to_device=False, verbose=False
            )
            model = materialize(model, param_dtype=jnp.bfloat16)
        _, state = nnx.split(model)
        jax.block_until_ready(jax.tree.leaves(state))
        fence(state)
        print(f"  construct(abstract): {t_construct:.2f}s  read-ckpt: {t_load:.2f}s")

    what = "weights-on-device"
    if args.first_result:
        import numpy as np

        t_w = time.perf_counter() - t0
        img = jnp.zeros((args.batch, 3, *CFG["img_size"]), jnp.float32)
        out = jax.jit(model.forward_pair)(img, img)
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])  # fence (see fence())
        print(f"  weights-on-device: {t_w:.2f}s  trace+compile+fwd: {time.perf_counter() - t0 - t_w:.2f}s")
        what = "FIRST RESULT"
    dt = time.perf_counter() - t0
    n = sum(
        x.size for x in jax.tree.leaves(nnx.split(model)[1]) if hasattr(x, "size")
    )
    print(f"mode={args.mode}: {dt:.2f}s to {what} ({n/1e6:.0f}M params, backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
