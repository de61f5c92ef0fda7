"""
True multi-PROCESS training: two OS processes join via jax.distributed
(Gloo collectives on CPU), build the global mesh, and run the real
dp train step on per-process local batches. The loss trajectory must
match a single-process run on the concatenated batch bit-for-bit-ish.

This is the executable proof behind parallel/multihost.py (SURVEY §2.8
"multi-host via jax.distributed") — the dryrun only ever simulates many
chips inside ONE process; here process boundaries, the coordinator
handshake, make_array_from_process_local_data, and cross-process
collectives are all real.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = textwrap.dedent(
    """
    import json, os, sys
    pid, nproc, coord, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={4 // nproc}"
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        from uniception_tpu.parallel.multihost import initialize_multihost, shard_local_batch
        initialize_multihost(coordinator_address=coord, num_processes=nproc, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from flax import nnx
    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.parallel.training import make_train_step
    from uniception_tpu.parallel.mesh import shard_batch

    SMALL = dict(img_size=(32, 32), enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
                 info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4)
    model = DUSt3R(name="mh", rngs=nnx.Rngs(0), **SMALL)
    ctx, params, opt_state = make_train_step(model, learning_rate=1e-3, data=4)

    # every process generates the identical GLOBAL batch, then keeps its rows
    rng = np.random.RandomState(0)
    gb = 8
    full = [rng.randn(gb, 3, 32, 32).astype(np.float32), rng.randn(gb, 3, 32, 32).astype(np.float32),
            rng.randn(gb, 32, 32, 3).astype(np.float32), rng.randn(gb, 32, 32, 3).astype(np.float32)]

    losses = []
    with ctx.mesh:
        if nproc > 1:
            local = gb // nproc
            batch = shard_local_batch(tuple(a[pid * local:(pid + 1) * local] for a in full), ctx.mesh)
        else:
            batch = shard_batch(tuple(jnp.asarray(a) for a in full), ctx.mesh)
        for _ in range(3):
            loss, params, opt_state = ctx.step(params, opt_state, *batch)
            losses.append(float(loss))

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(losses, f)
    print("worker", pid, "done", losses, flush=True)
    """
)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(args, out_path, timeout=600):
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, "-c", WORKER, *[str(a) for a in args], str(out_path)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
@pytest.mark.slow_subprocess
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"

    # 2 processes x 2 virtual devices, real jax.distributed handshake
    multi_out = tmp_path / "multi.json"
    procs = [_run([pid, 2, coord], multi_out) for pid in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    # single process, 4 virtual devices, same global batch
    single_out = tmp_path / "single.json"
    p = _run([0, 1, "unused"], single_out)
    o = p.communicate(timeout=600)[0]
    assert p.returncode == 0, f"single-process reference failed:\n{o[-3000:]}"

    multi = json.loads(multi_out.read_text())
    single = json.loads(single_out.read_text())
    assert len(multi) == len(single) == 3
    np.testing.assert_allclose(multi, single, rtol=1e-5, atol=1e-6)
