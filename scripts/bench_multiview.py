"""
Multi-view N-frame pointmap benchmark (the tracked "stretch" config).

ViT-L encoder + alternating (VGGT-style) info sharing over N frames at
512x512, bf16 + Pallas attention. Prints one JSON line
{"metric", "value", "unit"} in frames/s/chip.

Usage: BENCH_VIEWS=4 BENCH_BATCH=1 python scripts/bench_multiview.py
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

    from uniception_tpu.models.factory.multiview import MultiViewPointmapModel
    from uniception_tpu.models.utils.config import set_attention_impl, set_gelu_mode

    set_attention_impl(os.environ.get("BENCH_ATTN", "pallas"))
    set_gelu_mode(os.environ.get("BENCH_GELU", "tanh"))
    IMG = int(os.environ.get("BENCH_IMG", "512"))
    VIEWS = int(os.environ.get("BENCH_VIEWS", "4"))
    BATCH = int(os.environ.get("BENCH_BATCH", "1"))
    ITERS = int(os.environ.get("BENCH_ITERS", "8"))
    ATTN_TYPE = os.environ.get("BENCH_MV_ATTN", "alternating")

    model = MultiViewPointmapModel(
        name="mv_bench",
        num_views=VIEWS,
        img_size=(IMG, IMG),
        attention_type=ATTN_TYPE,
        dtype=jnp.bfloat16,
        rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(model)
    state = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state)
    if os.environ.get("BENCH_QUANT", "int8") == "int8":
        from uniception_tpu.nn.quant import quantize_linears

        model = nnx.merge(graphdef, state)
        n_q = quantize_linears(model.encoder) + quantize_linears(model.info_sharing)
        print(f"int8-quantized {n_q} trunk linears", file=sys.stderr)
        graphdef, state = nnx.split(model)

    def one(state, views, carry):
        m = nnx.merge(graphdef, state)
        outs = m([views[0] + carry * 1e-12] + list(views[1:]))
        return sum(o["pts3d"].mean() for o in outs).astype(jnp.float32)

    def make(iters):
        @jax.jit
        def many(state, *views):
            def body(c, _):
                return one(state, views, c), None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return s

        return many

    rng = np.random.RandomState(0)
    views = [jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32)) for _ in range(VIEWS)]

    short, long = make(2), make(2 + ITERS)
    float(short(state, *views))
    float(long(state, *views))
    t_s, t_l = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(short(state, *views))
        t_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(long(state, *views))
        t_l.append(time.perf_counter() - t0)
    per_fwd = (min(t_l) - min(t_s)) / ITERS
    frames_per_sec = BATCH * VIEWS / per_fwd
    print(
        json.dumps(
            {
                "metric": f"multiview_{VIEWS}frame_vitl_{IMG}_{ATTN_TYPE}_frames_per_sec",
                "value": round(frames_per_sec, 3),
                "unit": "frames/s/chip",
            }
        )
    )
    print(f"views={VIEWS} batch={BATCH} per_fwd={per_fwd * 1e3:.1f}ms")


if __name__ == "__main__":
    main()
