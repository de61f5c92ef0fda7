"""Root-cause the 512-dpt serving spread (VERDICT r4 weak #3 / next #5).

Round 4 recorded DUSt3R 512-dpt int8 at 48.44 +/- 6.26 pairs/s (+/-13%)
while flow-dpt from the same harness read +/- 0.35 — unexplained. This
experiment separates the two hypotheses:

  * tunnel weather: a slow host<->TPU fetch or background chip activity
    hits whichever config happens to be measuring — INTERLEAVED int8/bf16
    samples then wobble TOGETHER (and more repeats tighten the median).
  * real scheduling instability in the int8-dpt program: only the int8
    samples wobble, bf16 stays tight.

Method: ONE process builds the 512-dpt model, keeps a bf16 state and an
int8-quantized state, compiles a chained (lax.scan) forward for each, then
alternates A/B measurements for --repeats rounds. Each sample is the
paired (long - short) / iters chained estimate — pure device time. Prints
per-config median +/- half-range and the correlation between adjacent
A/B samples.

Run on the TPU (background; one TPU — serialize):
    python scripts/bench_dpt_spread.py [--repeats 9] [--iters 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=9)
    ap.add_argument("--head", default="dpt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.models.utils.config import set_attention_impl, set_gelu_mode
    from uniception_tpu.nn.quant import quantize_trunk

    set_attention_impl("pallas")
    set_gelu_mode("tanh")
    IMG, BATCH, ITERS = args.img, args.batch, args.iters

    model = DUSt3R(
        name=f"dust3r_{IMG}_{args.head}",
        img_size=(IMG, IMG),
        patch_embed_cls="ManyAR_PatchEmbed",
        pred_head_type=args.head,
        dtype=jnp.bfloat16,
        scan_blocks=True,
        rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(model)
    state = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state)

    # int8 copy: quantize a re-merged model (fresh split keeps the bf16 state intact)
    m_q = nnx.merge(*nnx.split(nnx.merge(graphdef, state)))
    n_q = quantize_trunk(m_q, "all", asym=None)
    graphdef_q, state_q = nnx.split(m_q)
    print(f"int8-quantized {n_q} trunk linears", file=sys.stderr, flush=True)

    def make(gd, iters):
        @jax.jit
        def many(state, img1, img2, ts):
            def body(c, _):
                m = nnx.merge(gd, state)
                r1, r2 = m.forward_pair(img1 + c * 1e-12, img2, true_shape1=ts, true_shape2=ts)
                s = (r1["pts3d"].mean() + r1["conf"].mean() + r2["pts3d_in_other_view"].mean()).astype(jnp.float32)
                return s, None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return s

        return many

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))
    img2 = jnp.asarray(rng.randn(BATCH, 3, IMG, IMG).astype(np.float32))
    ts = jnp.broadcast_to(jnp.asarray([IMG, IMG], jnp.int32), (BATCH, 2))

    configs = {
        "int8": (make(graphdef_q, 2), make(graphdef_q, 2 + ITERS), state_q),
        "bf16": (make(graphdef, 2), make(graphdef, 2 + ITERS), state),
    }
    for name, (short, long_, st) in configs.items():
        t0 = time.time()
        float(short(st, img1, img2, ts))
        float(long_(st, img1, img2, ts))
        print(f"{name} compiled in {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    samples = {k: [] for k in configs}
    for r in range(args.repeats):
        for name, (short, long_, st) in configs.items():  # interleave A/B
            t0 = time.perf_counter()
            float(short(st, img1, img2, ts))
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(long_(st, img1, img2, ts))
            t_l = time.perf_counter() - t0
            rate = BATCH / ((t_l - t_s) / ITERS)
            samples[name].append(rate)
            print(f"round {r}: {name} {rate:.2f} pairs/s", flush=True)

    print()
    for name, xs in samples.items():
        xs_sorted = sorted(xs)
        med = xs_sorted[len(xs_sorted) // 2]
        spread = (max(xs) - min(xs)) / 2
        print(f"{name}: median {med:.2f} +/- {spread:.2f} pairs/s ({100 * spread / med:.1f}%)  samples={[f'{x:.1f}' for x in xs]}")
    a, b = np.asarray(samples["int8"]), np.asarray(samples["bf16"])
    if len(a) >= 3 and a.std() > 0 and b.std() > 0:
        corr = float(np.corrcoef(a, b)[0, 1])
        print(f"adjacent-sample correlation int8<->bf16: {corr:+.2f} "
              f"(>0.5 => shared cause [tunnel/chip weather]; ~0 or <0 => config-specific instability)")


if __name__ == "__main__":
    main()
