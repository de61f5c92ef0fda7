"""
UFM-style flow-model benchmark: two-view dense correspondence @ 512x512.

The reference's named downstream consumer is the UFM flow model
(/root/reference/README.md:167-171), composed from UniCeption parts; the
reference itself ships no flow benchmark. This script prices our native
composition (models/factory/flow.py: CroCo ViT-L encoder -> two-view
cross-attention info-sharing -> DPT head -> FlowWithConfidenceAdaptor)
with the same methodology as bench.py: chained lax.scan iterations with a
data-dependent carry (tunnel-safe), N paired repeats, median +/- spread.

Usage: python scripts/bench_flow.py
Env:   BENCH_IMG=512 BENCH_BATCH=2 BENCH_QUANT=int8|none BENCH_HEAD=dpt|linear
       BENCH_ITERS=10 BENCH_REPEATS=5 BENCH_ATTN=pallas BENCH_GELU=tanh
Prints one JSON line {"metric", "value", "unit", "spread"}.
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
    from flax import nnx

    from uniception_tpu.models.factory.flow import UFMFlow
    from uniception_tpu.models.utils.config import set_attention_impl, set_gelu_mode

    set_attention_impl(os.environ.get("BENCH_ATTN", "pallas"))
    set_gelu_mode(os.environ.get("BENCH_GELU", "tanh"))
    IMG = int(os.environ.get("BENCH_IMG", "512"))
    BATCH = int(os.environ.get("BENCH_BATCH", "2"))
    ITERS = int(os.environ.get("BENCH_ITERS", "10"))
    HEAD = os.environ.get("BENCH_HEAD", "dpt")  # UFM's flagship head is DPT
    QUANT = os.environ.get("BENCH_QUANT", "int8")

    model = UFMFlow(
        name=f"ufm_flow_{IMG}_{HEAD}",
        img_size=(IMG, IMG),
        pred_head_type=HEAD,
        scan_blocks=os.environ.get("BENCH_SCAN", "1") == "1",
        dtype=jnp.bfloat16,
        rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(model)
    state = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state)
    if QUANT == "int8":
        from uniception_tpu.nn.quant import quantize_trunk

        model = nnx.merge(graphdef, state)
        n_q = quantize_trunk(model, os.environ.get("BENCH_QUANT_POLICY", "all"))
        print(f"int8-quantized {n_q} trunk linears", file=sys.stderr)
        graphdef, state = nnx.split(model)

    def one(state, img1, img2, carry):
        m = nnx.merge(graphdef, state)
        out = m.forward_pair(img1 + carry * 1e-12, img2)
        return (out["flow"].mean() + out["flow_conf"].mean()).astype(jnp.float32)

    def make(iters):
        @jax.jit
        def many(state, img1, img2):
            def body(c, _):
                return one(state, img1, img2, c), None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return s

        return many

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))
    img2 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))

    short, long = make(2), make(2 + ITERS)
    float(short(state, img1, img2))  # compile
    float(long(state, img1, img2))

    REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))
    t_short, t_long = [], []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(short(state, img1, img2))
        t_short.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(long(state, img1, img2))
        t_long.append(time.perf_counter() - t0)
    per_iter_samples = sorted((tl - ts_) / ITERS for tl, ts_ in zip(t_long, t_short))
    per_iter = per_iter_samples[len(per_iter_samples) // 2]
    rate_samples = [BATCH / s for s in per_iter_samples]
    pairs_per_sec = BATCH / per_iter
    spread = (max(rate_samples) - min(rate_samples)) / 2

    print(
        json.dumps(
            {
                "metric": f"ufm_flow_{IMG}_{HEAD}_pairs_per_sec",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s/chip",
                "spread": round(spread, 3),
            }
        )
    )
    print(
        f"batch={BATCH} iters={ITERS} repeats={REPEATS} per_fwd={per_iter*1000:.1f}ms "
        f"median={pairs_per_sec:.2f}+/-{spread:.2f}pairs/s quant={QUANT}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
