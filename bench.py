"""
Headline benchmark: two-view DUSt3R ViT-L pointmap inference @ 512x512.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); vs_baseline is computed
against an analytic estimate of the reference's throughput on its target
GPU (A100, fp16 autocast, assumed 40% MFU over the measured model FLOPs) —
see BASELINE.md for the derivation. The north-star target is >=3x that
(BASELINE.json).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R

    IMG = 512
    BATCH = int(__import__("os").environ.get("BENCH_BATCH", "4"))
    DTYPE = jnp.bfloat16

    model = DUSt3R(
        name="dust3r_512_linear",
        img_size=(IMG, IMG),
        patch_embed_cls="ManyAR_PatchEmbed",
        pred_head_type="linear",
        dtype=DTYPE,
        rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(model)

    def fwd(state, img1, img2, ts1, ts2):
        m = nnx.merge(graphdef, state)
        res1, res2 = m.forward_pair(img1, img2, true_shape1=ts1, true_shape2=ts2)
        return res1["pts3d"], res1["conf"], res2["pts3d_in_other_view"], res2["conf"]

    fwd_jit = jax.jit(fwd)

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))
    img2 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))
    ts = jnp.broadcast_to(jnp.asarray([IMG, IMG], jnp.int32), (BATCH, 2))

    # warmup / compile
    out = fwd_jit(state, img1, img2, ts, ts)
    jax.block_until_ready(out)

    # timed runs
    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd_jit(state, img1, img2, ts, ts)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * n_iters / dt

    # analytic flops per pair (fwd), for the MFU-derived baseline estimate
    n_tok = (IMG // 16) ** 2  # 1024 tokens per view

    def block_flops(n, d, mlp_ratio=4, n_ctx=None):
        n_ctx = n_ctx or n
        attn_proj = 2 * n * d * 3 * d + 2 * n * d * d
        attn_mat = 2 * n * n_ctx * d * 2
        mlp = 2 * n * d * mlp_ratio * d * 2
        return attn_proj + attn_mat + mlp

    enc_flops = 24 * block_flops(n_tok, 1024) * 2  # 2 views
    # decoder: self-attn (768) + cross-attn vs other view's 1024 tokens + mlp
    dec_self = 2 * n_tok * 768 * 3 * 768 + 2 * n_tok * n_tok * 768 * 2 + 2 * n_tok * 768 * 768
    dec_cross = 2 * n_tok * 768 * 768 * 4 + 2 * n_tok * n_tok * 768 * 2
    dec_mlp = 2 * n_tok * 768 * 4 * 768 * 2
    dec_flops = 12 * (dec_self + dec_cross + dec_mlp) * 2
    head_flops = 2 * n_tok * 768 * 4 * 256 * 2
    flops_per_pair = enc_flops + dec_flops + head_flops

    # Reference baseline estimate: A100 fp16 dense peak 312 TF/s at 40% MFU
    baseline_pairs_per_sec = 312e12 * 0.40 / flops_per_pair

    achieved_tflops = flops_per_pair * pairs_per_sec / 1e12

    result = {
        "metric": "dust3r_vitl_512_linear_pairs_per_sec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / baseline_pairs_per_sec, 3),
    }
    print(json.dumps(result))
    # extra diagnostics on stderr so the stdout JSON stays clean
    import sys

    print(
        f"batch={BATCH} iters={n_iters} wall={dt:.3f}s flops/pair={flops_per_pair/1e9:.1f}GF "
        f"achieved={achieved_tflops:.1f}TF/s baseline_est={baseline_pairs_per_sec:.2f}pairs/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
