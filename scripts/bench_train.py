"""
Training-step benchmark: DUSt3R ViT-L two-view @ 512x512, full
fwd+bwd+adamw update on one chip.

The reference ships no training loop (single-GPU harnesses only print
fwd/bwd latency, e.g. uniception/models/encoders/utils.py:11-81); this
script is the TPU-native equivalent measurement for the training path,
exercising the Pallas flash-attention backward kernels.

Usage: python scripts/bench_train.py  [BENCH_BATCH=4 BENCH_ITERS=6 ...]
Prints one JSON line {"metric", "value", "unit"} (pairs/s/chip, training).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.models.utils.config import set_attention_impl, set_gelu_mode
    from uniception_tpu.parallel.training import dust3r_confidence_loss

    set_attention_impl(os.environ.get("BENCH_ATTN", "pallas"))
    set_gelu_mode(os.environ.get("BENCH_GELU", "tanh"))
    IMG = int(os.environ.get("BENCH_IMG", "512"))
    HEAD = os.environ.get("BENCH_HEAD", "linear")  # linear | dpt (the reference flagship 512-dpt)
    BATCH = int(os.environ.get("BENCH_BATCH", "2"))  # fastest measured: b2 no-remat 11.9 pairs/s
    ITERS = int(os.environ.get("BENCH_ITERS", "6"))
    # BENCH_MODEL=flow benches the UFM-style flow model (factory/flow.py)
    # with flow_confidence_loss instead of the DUSt3R pair
    MODEL = os.environ.get("BENCH_MODEL", "dust3r")

    # BENCH_REMAT: 0 = none, 1 = trunk+heads, trunk = trunk blocks only,
    # head = DPT-head fusion/regressor only (the heads' fp32 full-res
    # activations, not the trunk, set the dpt memory boundary)
    REMAT = os.environ.get("BENCH_REMAT", "0")
    # BENCH_MODEL=multiview: N-frame alternating-attention training
    # (factory/multiview.py + multiview_confidence_loss) — the VGGT-style
    # consumer config; BENCH_VIEWS sets N (default 4), metric is frames/s
    VIEWS = int(os.environ.get("BENCH_VIEWS", "4"))
    if MODEL == "multiview":
        from uniception_tpu.models.factory.multiview import MultiViewPointmapModel

        model = MultiViewPointmapModel(
            name=f"multiview_{VIEWS}x{IMG}",
            num_views=VIEWS,
            img_size=(IMG, IMG),
            attention_type=os.environ.get("BENCH_ATTN_TYPE", "alternating"),
            gradient_checkpointing=REMAT in ("1", "trunk"),
            scan_blocks=os.environ.get("BENCH_SCAN", "0") == "1",
            dtype=jnp.bfloat16,
            rngs=nnx.Rngs(0),
        )
    elif MODEL == "flow":
        from uniception_tpu.models.factory.flow import UFMFlow

        model = UFMFlow(
            name=f"ufm_flow_{IMG}_{HEAD}",
            img_size=(IMG, IMG),
            pred_head_type=HEAD,
            gradient_checkpointing=REMAT in ("1", "trunk"),
            head_gradient_checkpointing=REMAT in ("1", "head"),
            scan_blocks=os.environ.get("BENCH_SCAN", "0") == "1",
            dtype=jnp.bfloat16,
            rngs=nnx.Rngs(0),
        )
    else:
        model = DUSt3R(
            name=f"dust3r_512_{HEAD}",
            img_size=(IMG, IMG),
            patch_embed_cls="ManyAR_PatchEmbed",
            pred_head_type=HEAD,
            gradient_checkpointing=REMAT in ("1", "trunk"),
            head_gradient_checkpointing=REMAT in ("1", "head"),
            scan_blocks=os.environ.get("BENCH_SCAN", "0") == "1",
            dtype=jnp.bfloat16,  # bf16 compute, fp32 params (standard mixed precision)
            rngs=nnx.Rngs(0),
        )
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    # BENCH_MU_DTYPE=bfloat16 stores the first adamw moment in bf16 —
    # halves its HBM read+write traffic in the bandwidth-bound optimizer
    mu_dtype = jnp.bfloat16 if os.environ.get("BENCH_MU_DTYPE") == "bfloat16" else None
    tx = optax.adamw(1e-4, mu_dtype=mu_dtype)
    # BENCH_FREEZE=encoder measures the frozen-pretrained-encoder finetune
    # (make_train_step(trainable=...) semantics): stop_gradient on the frozen
    # leaves drops their wgrad matmuls from the backward, multi_transform +
    # set_to_zero drops their optimizer moments
    FREEZE = os.environ.get("BENCH_FREEZE")
    if FREEZE:
        from uniception_tpu.utils.pytree import keypath_str

        labels = jax.tree_util.tree_map_with_path(
            lambda kp, _: "freeze" if keypath_str(kp).startswith(FREEZE + ".") else "train", params
        )
        frozen_mask = jax.tree.map(lambda l: l == "freeze", labels)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    else:
        frozen_mask = None
    opt_state = tx.init(params)

    def loss_fn(params, img1, img2, ts, tgt1, tgt2, carry):
        if frozen_mask is not None:
            params = jax.tree.map(
                lambda x, f: jax.lax.stop_gradient(x) if f else x, params, frozen_mask
            )
        m = nnx.merge(graphdef, params, rest)
        if MODEL == "multiview":
            from uniception_tpu.parallel.training import multiview_confidence_loss

            # img1 is the stacked (V, B, 3, H, W) clip; tgt1 is (V, B, H, W, 3)
            views = [img1[0] + carry * 1e-12] + [img1[v] for v in range(1, VIEWS)]
            results = m(views)
            return multiview_confidence_loss(results, [tgt1[v] for v in range(VIEWS)]).astype(jnp.float32)
        if MODEL == "flow":
            from uniception_tpu.parallel.training import flow_confidence_loss

            out = m.forward_pair(img1 + carry * 1e-12, img2)
            # tgt1 (B,H,W,3) reused: first two channels as the flow target
            return flow_confidence_loss(out, tgt1[..., :2]).astype(jnp.float32)
        r1, r2 = m.forward_pair(img1 + carry * 1e-12, img2, true_shape1=ts, true_shape2=ts)
        return dust3r_confidence_loss(r1, r2, tgt1, tgt2).astype(jnp.float32)

    def step(params, opt_state, img1, img2, ts, tgt1, tgt2, carry):
        loss, grads = jax.value_and_grad(loss_fn)(params, img1, img2, ts, tgt1, tgt2, carry)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def make(iters):
        @jax.jit
        def many(params, opt_state, img1, img2, ts, tgt1, tgt2):
            def body(c, _):
                params, opt_state, carry = c
                params, opt_state, loss = step(params, opt_state, img1, img2, ts, tgt1, tgt2, carry)
                return (params, opt_state, loss), None

            (params, opt_state, loss), _ = jax.lax.scan(body, (params, opt_state, jnp.float32(0)), None, length=iters)
            return loss

        return many

    def run_donated(params, opt_state, args, iters):
        """BENCH_DONATE=1: the production pattern — one jitted step called
        per batch with params/opt_state donated, async dispatch, one value
        fetch at the end. Long-minus-short differencing cancels the
        ~100 ms tunnel fetch (block_until_ready is NOT a sync barrier on
        tunneled TPU setups — a real float() fetch is)."""
        step_jit = jax.jit(step, donate_argnums=(0, 1))

        def run_n(p, o, n):
            for _ in range(n):
                p, o, loss = step_jit(p, o, *args, jnp.float32(0))
            return p, o, float(loss)  # the fetch forces the whole chain

        p, o, _ = run_n(params, opt_state, 2)  # warmup/compile
        times = {}
        for n in (2, 2 + iters):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                p, o, _ = run_n(p, o, n)
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        return (times[2 + iters] - times[2]) / iters

    rng = np.random.RandomState(0)
    if MODEL == "multiview":
        img1 = jnp.asarray(rng.randn(VIEWS, BATCH, 3, IMG, IMG).astype(np.float32))
        tgt1 = jnp.asarray(rng.randn(VIEWS, BATCH, IMG, IMG, 3).astype(np.float32))
        img2 = tgt2 = jnp.zeros((1,), jnp.float32)  # unused slots in the fixed step signature
    else:
        img1 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))
        img2 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))
        tgt1 = jnp.asarray(rng.randn(BATCH, IMG, IMG, 3).astype(np.float32))
        tgt2 = jnp.asarray(rng.randn(BATCH, IMG, IMG, 3).astype(np.float32))
    ts = jnp.broadcast_to(jnp.asarray([IMG, IMG], jnp.int32), (BATCH, 2))
    args = (params, opt_state, img1, img2, ts, tgt1, tgt2)

    if MODEL == "multiview":
        metric = {
            "metric": f"multiview{VIEWS}_vitl_{IMG}_train_frames_per_sec",
            "unit": "frames/s/chip",
            "scale": VIEWS * BATCH,
        }
    else:
        metric = {
            "metric": f"{MODEL}_vitl_{IMG}_{HEAD}_train_pairs_per_sec",
            "unit": "pairs/s/chip",
            "scale": BATCH,
        }

    if os.environ.get("BENCH_DONATE") == "1":
        per_step = run_donated(params, opt_state, (img1, img2, ts, tgt1, tgt2), max(ITERS, 10))
        print(
            json.dumps(
                {
                    "metric": metric["metric"],
                    "value": round(metric["scale"] / per_step, 3),
                    "unit": metric["unit"],
                }
            )
        )
        print(f"batch={BATCH} per_step={per_step * 1e3:.1f}ms (donated python loop)")
        return

    short, long = make(1), make(1 + ITERS)
    float(short(*args))
    float(long(*args))
    t_short, t_long = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(short(*args))
        t_short.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(long(*args))
        t_long.append(time.perf_counter() - t0)
    per_step = (min(t_long) - min(t_short)) / ITERS
    print(
        json.dumps(
            {
                "metric": metric["metric"],
                "value": round(metric["scale"] / per_step, 3),
                "unit": metric["unit"],
            }
        )
    )
    print(f"batch={BATCH} per_step={per_step * 1e3:.1f}ms attn={os.environ.get('BENCH_ATTN', 'pallas')}")


if __name__ == "__main__":
    main()
