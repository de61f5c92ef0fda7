"""
Headline benchmark: two-view DUSt3R ViT-L pointmap inference @ 512x512.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the model runs in the production serving configuration —
bf16 params/compute with the Pallas flash-attention kernel and the trunk
linears int8-quantized (w8a8 dynamic, nn/quant.py; BENCH_QUANT=none for
pure bf16). Iterations are chained inside a single jit'd lax.scan
(data-dependent carry) so the measurement reflects pure device time — the
axon host<->TPU tunnel adds ~100ms per fetch, which a naive per-call
timing loop would mis-attribute. Accuracy per configuration is the round-4
precision ladder in BASELINE.md (scripts/tier_compare_torchinit.py):
int8 = 1.95e-2 rel pts3d at torch init, bf16 = 6.2e-3, and only the
BENCH_TIER=f32_gate rung passes the reference's golden thresholds
(abs<1e-2 / rel<1e-3) — as is true of the reference's own assumed
fp16-A100 serving config, which the 60.44 pairs/s baseline models.

vs_baseline: the reference publishes no numbers (BASELINE.md); the baseline
is an analytic estimate of the reference's throughput on its target GPU
(A100 fp16 autocast at an assumed 40% MFU over the measured model FLOPs).
The north-star target is >=3x that (BASELINE.json).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.models.utils.config import set_attention_impl, set_gelu_mode

    set_attention_impl(os.environ.get("BENCH_ATTN", "pallas"))
    set_gelu_mode(os.environ.get("BENCH_GELU", "tanh"))  # production activation
    if os.environ.get("BENCH_ATTN_QUANT"):  # int8 / int8pv attention kernel (opt-in)
        from uniception_tpu.models.utils.config import set_attention_quant

        set_attention_quant(os.environ["BENCH_ATTN_QUANT"])
    IMG = int(os.environ.get("BENCH_IMG", "512"))
    BATCH = int(os.environ.get("BENCH_BATCH", "2"))  # int8+scan sweep: b2=70.6, b3=69.2; dpt b2>b1; 224 optimum is b16
    ITERS = int(os.environ.get("BENCH_ITERS", "10"))
    # int8: w8a8 dynamic-quantized trunk projections (nn/quant.py) — the
    # production serving configuration; MXU int8 runs at 2x the bf16 rate.
    # Parity vs the bf16 path is gated in tests/nn/test_quant.py and the
    # measured full-model bound is recorded in BASELINE.md.
    QUANT = os.environ.get("BENCH_QUANT", "int8")
    # BENCH_TIER=f32_gate: the gate-passing precision rung of the ladder —
    # f32 params, matmul precision "highest", exact GELU, XLA attention
    # (the exact numerics that pass the reference's abs<1e-2/rel<1e-3 golden
    # thresholds in tests/models/test_dust3r_fullsize.py). Used to price the
    # strict-parity tier; see BASELINE.md round-4 precision ladder.
    TIER = os.environ.get("BENCH_TIER", "serving")
    if TIER == "f32_gate":
        QUANT = "none"
        set_attention_impl("xla")
        set_gelu_mode("exact")

    HEAD = os.environ.get("BENCH_HEAD", "linear")  # linear | dpt (the reference's flagship 512-dpt)
    # BENCH_HEAD_DTYPE=bf16 runs the heads in bf16 (opt-in; default keeps the
    # reference's fp32 head region — parity impact measured in BASELINE.md)
    HEAD_DTYPE = jnp.bfloat16 if os.environ.get("BENCH_HEAD_DTYPE") == "bf16" else None
    model = DUSt3R(
        name=f"dust3r_512_{HEAD}",
        img_size=(IMG, IMG),
        patch_embed_cls="ManyAR_PatchEmbed",
        pred_head_type=HEAD,
        head_dtype=HEAD_DTYPE,
        dtype=jnp.float32 if TIER == "f32_gate" else jnp.bfloat16,
        # scan layout: trace-once trunk, ~7x faster TPU compiles AND measured
        # faster at runtime (70.0 vs 67.0 pairs/s int8 b2); BENCH_SCAN=0 for loop
        scan_blocks=os.environ.get("BENCH_SCAN", "1") == "1",
        rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(model)
    if TIER == "f32_gate":
        jax.config.update("jax_default_matmul_precision", "highest")
    else:
        # bf16 weights: inference-serving configuration
        state = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state)
    if QUANT == "int8":
        from uniception_tpu.nn.quant import quantize_trunk

        # BENCH_QUANT_POLICY: mixed-precision trunk policy (nn/quant.py
        # trunk_policy grammar; "all" = every trunk linear). BENCH_QUANT_ASYM:
        # which of those use zero-point activation quant (default none — asym
        # cuts the bill only 1.95e-2 -> 1.88e-2 for -3.5% throughput; the
        # bill is weight-quant dominated). Frontier: BASELINE.md round 4.
        policy = os.environ.get("BENCH_QUANT_POLICY", "all")
        asym = os.environ.get("BENCH_QUANT_ASYM", None)
        model = nnx.merge(graphdef, state)
        n_q = quantize_trunk(model, policy, asym=asym)
        print(f"int8-quantized {n_q} trunk linears (policy={policy}, asym={asym or 'none'})", file=sys.stderr)
        if os.environ.get("BENCH_GPTQ"):
            # calibrated GPTQ codes (scripts/calibrate_gptq.py) — same
            # compiled program as RTN (only constant values differ), so this
            # is an accuracy knob, not a speed one (BASELINE.md round 4)
            from uniception_tpu.nn.gptq import apply_gptq, load_gptq_npz

            n_g = apply_gptq(model, load_gptq_npz(os.environ["BENCH_GPTQ"]))
            print(f"GPTQ codes applied to {n_g} layers", file=sys.stderr)
        graphdef, state = nnx.split(model)

    def one(state, img1, img2, ts, carry):
        m = nnx.merge(graphdef, state)
        r1, r2 = m.forward_pair(img1 + carry * 1e-12, img2, true_shape1=ts, true_shape2=ts)
        return (r1["pts3d"].mean() + r1["conf"].mean() + r2["pts3d_in_other_view"].mean()).astype(jnp.float32)

    def make(iters):
        @jax.jit
        def many(state, img1, img2, ts):
            def body(c, _):
                return one(state, img1, img2, ts, c), None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return s

        return many

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))
    img2 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))
    ts = jnp.broadcast_to(jnp.asarray([IMG, IMG], jnp.int32), (BATCH, 2))

    short, long = make(2), make(2 + ITERS)
    float(short(state, img1, img2, ts))  # compile
    float(long(state, img1, img2, ts))

    # N repeats -> median +/- spread: round-over-round drift smaller than the
    # spread is tunnel weather, not a regression (VERDICT r3 #6)
    REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))
    t_short, t_long = [], []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(short(state, img1, img2, ts))
        t_short.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(long(state, img1, img2, ts))
        t_long.append(time.perf_counter() - t0)
    # pair the chained measurements: each (long_i - short_i) is one estimate
    per_iter_samples = sorted((tl - ts_) / ITERS for tl, ts_ in zip(t_long, t_short))
    per_iter = per_iter_samples[len(per_iter_samples) // 2]  # median
    rate_samples = [BATCH / s for s in per_iter_samples]
    pairs_per_sec = BATCH / per_iter
    spread = (max(rate_samples) - min(rate_samples)) / 2

    # analytic flops per pair (fwd) for the MFU-derived baseline estimate
    n_tok = (IMG // 16) ** 2
    enc_flops = 24 * (2 * n_tok * 1024 * 3 * 1024 + 4 * n_tok * n_tok * 1024 + 2 * n_tok * 1024 * 1024 + 16 * n_tok * 1024 * 1024) * 2
    dec_self = 2 * n_tok * 768 * 3 * 768 + 4 * n_tok * n_tok * 768 + 2 * n_tok * 768 * 768
    dec_cross = 2 * n_tok * 768 * 768 * 4 + 4 * n_tok * n_tok * 768
    dec_mlp = 16 * n_tok * 768 * 768
    dec_flops = 12 * (dec_self + dec_cross + dec_mlp) * 2
    head_flops = 2 * n_tok * 768 * 4 * 256 * 2
    flops_per_pair = enc_flops + dec_flops + head_flops

    baseline_pairs_per_sec = 312e12 * 0.40 / flops_per_pair  # A100 fp16 @ 40% MFU

    result = {
        "metric": f"dust3r_vitl_{IMG}_{HEAD}_pairs_per_sec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / baseline_pairs_per_sec, 3),
        "spread": round(spread, 3),  # +/- half-range over BENCH_REPEATS chained runs
    }
    print(json.dumps(result))
    print(
        f"batch={BATCH} iters={ITERS} repeats={REPEATS} per_fwd={per_iter*1000:.1f}ms "
        f"median={pairs_per_sec:.2f}+/-{spread:.2f}pairs/s flops/pair={flops_per_pair/1e9:.1f}GF "
        f"achieved={flops_per_pair*pairs_per_sec/1e12:.1f}TF/s baseline_est={baseline_pairs_per_sec:.2f}pairs/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
