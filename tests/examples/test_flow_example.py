"""
The flow model's end-to-end tooling surface (VERDICT r4 #3): the UFM-style
``UFMFlow`` factory must serve and train through the SAME example paths as
DUSt3R — native serving checkpoints (convert --serving --model flow) with
int8 + GPTQ composing, aspect-bucketed serving (non-ManyAR: portrait pairs
get their own transposed canvases), and the training example with
checkpoint/resume matching an uninterrupted oracle.

Reference anchor: UFM is the reference's named downstream consumer
(/root/reference/README.md:167-171); the reference itself ships no serving
or training stack (SURVEY.md §0).
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# wide enough that quantize_linears' min_params threshold (1<<16) converts
# the encoder projections (mirrors test_serve_example.py's int8 config)
TINY = dict(img_size=64, enc_dim=256, enc_depth=2, enc_heads=4, dec_dim=64, dec_depth=2, dec_heads=4)


def _flags(d):
    return [f"--{k.replace('_', '-')}={v}" for k, v in d.items()]


def _run(script, *argv, timeout=600, n_devices=None):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split() if "device_count" not in f]
    if n_devices:
        flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, *script), *argv],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )


def _build_flow(cfg):
    from uniception_tpu.models.factory.flow import UFMFlow

    return UFMFlow(
        name="ufm_flow_serve",
        img_size=(cfg["img_size"],) * 2,
        pred_head_type="linear",
        enc_embed_dim=cfg["enc_dim"],
        enc_depth=cfg["enc_depth"],
        enc_num_heads=cfg["enc_heads"],
        info_sharing_dim=cfg["dec_dim"],
        info_sharing_depth=cfg["dec_depth"],
        info_sharing_num_heads=cfg["dec_heads"],
        scan_blocks=True,
        dtype=jnp.bfloat16,
        rngs=nnx.Rngs(0),
    )


@pytest.fixture(scope="module")
def flow_ckpt(tmp_path_factory):
    "Tiny torch-layout interchange UFMFlow checkpoint (random eager-init weights)."
    from uniception_tpu.utils.checkpoint import save_checkpoint
    from uniception_tpu.utils.torch_compat import state_dict_from_module

    path = str(tmp_path_factory.mktemp("flow_serve") / "flow_torch.npz")
    save_checkpoint(path, state_dict_from_module(_build_flow(TINY)))
    return path


def test_serve_flow_from_torch_layout_checkpoint(flow_ckpt):
    "Fast representative: serve --model flow end-to-end from the interchange format."
    out = _run(
        ("examples", "serve_dust3r.py"),
        "--model", "flow", "--checkpoint", flow_ckpt,
        "--pairs", "2", "--batch", "1", "--head", "linear", *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pairs/s" in out.stdout, out.stdout
    assert "flow:" in out.stdout and "flow_conf:" in out.stdout, out.stdout


@pytest.mark.slow_subprocess
def test_convert_serving_flow_int8_gptq_then_serve(flow_ckpt, tmp_path):
    """convert --serving --model flow --int8 --gptq -> packed .nsv with the
    GPTQ codes embedded -> serve --model flow consumes it (the VERDICT-r4
    'flow .nsv served in a fresh-process test' gate, int8+GPTQ composing)."""
    from uniception_tpu.nn.gptq import gptq_int8
    from uniception_tpu.nn.quant import quantize_trunk
    from uniception_tpu.utils.coldstart import abstract_construct, is_native_state, load_native_state, materialize

    model = _build_flow(TINY)

    # GPTQ one stacked layer (enc fc1) against a random SPD Hessian; keys in
    # the loop-layout format calibrate_gptq.py emits
    k = np.asarray(model.encoder.enc_blocks.mlp.fc1.kernel[...], np.float32)  # (depth, in, out)
    rng = np.random.RandomState(0)
    codes, expected = {}, []
    for i in range(k.shape[0]):
        A = rng.randn(k.shape[1], 4 * k.shape[1]).astype(np.float64)
        H = A @ A.T / A.shape[1] + 0.1 * np.eye(k.shape[1])
        w_q, w_s = gptq_int8(k[i], H)
        codes[f"encoder.enc_blocks.{i}.mlp.fc1.w_q"] = w_q
        codes[f"encoder.enc_blocks.{i}.mlp.fc1.w_scale"] = w_s
        expected.append(w_q)
    gptq_npz = str(tmp_path / "flow_codes.npz")
    np.savez(gptq_npz, **codes)

    native = str(tmp_path / "flow_int8_gptq.nsv")
    out = _run(
        ("scripts", "convert_checkpoints.py"),
        flow_ckpt, native, "--serving", "--model", "flow", "--int8",
        f"--gptq={gptq_npz}", "--head", "linear", *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "embedded GPTQ codes for 1 layers" in out.stdout, out.stdout
    assert is_native_state(native)

    # the embedded codes are the GPTQ ones, reconstructed by the serve-side load
    arrays, meta = load_native_state(native)
    assert meta["quant"] == "int8-w8a8-dynamic" and meta["quant_gptq_layers"] == 1

    def ctor_q():
        m = _build_flow(TINY)
        quantize_trunk(m, meta["quant_policy"], asym=meta["quant_asym"])
        return m

    m_loaded = materialize(abstract_construct(ctor_q), arrays=arrays)
    np.testing.assert_array_equal(
        np.asarray(m_loaded.encoder.enc_blocks.mlp.fc1.w_q[...]), np.stack(expected)
    )

    # fresh-process serve of the flow .nsv
    out = _run(
        ("examples", "serve_dust3r.py"),
        "--model", "flow", "--checkpoint", native,
        "--pairs", "2", "--batch", "1", "--head", "linear", *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "serving int8" in out.stdout and "pairs/s" in out.stdout, out.stdout
    assert "flow:" in out.stdout, out.stdout


@pytest.mark.slow_subprocess
def test_serve_flow_bucketed(flow_ckpt):
    """--model flow --buckets: aspect-bucketed serving WITHOUT the ManyAR
    transpose — portrait pairs land in their own transposed canvases
    (data/bucketing.py manyar=False + with_portrait_buckets)."""
    out = _run(
        ("examples", "serve_dust3r.py"),
        "--model", "flow", "--checkpoint", flow_ckpt, "--buckets",
        "--pairs", "6", "--batch", "2", "--head", "linear", *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pairs/s" in out.stdout and "flow:" in out.stdout, out.stdout
    # the synthetic request stream includes portrait pairs; with manyar=False
    # they must be served from a PORTRAIT canvas (h > w), not rotated
    import re

    served = re.search(r"buckets \{(.*)\}", out.stdout)
    assert served, out.stdout
    canvases = re.findall(r"\((\d+), (\d+)\)", served.group(1))
    assert any(int(h) > int(w) for h, w in canvases), (
        f"no portrait canvas served: {served.group(1)}"
    )


@pytest.mark.slow_subprocess
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_train_flow_resumes_matches_oracle(tmp_path):
    """Flow training end-to-end on the virtual mesh: 2 steps -> checkpoint ->
    resume 2 more == an uninterrupted 4-step run (the VERDICT-r4 'flow train
    step resumed in a fresh-process test' gate)."""

    def run(dir_, *extra):
        return _run(
            ("examples", "train_dust3r.py"),
            "--model", "flow", "--steps", "2", "--dataset-size", "16", "--batch", "8",
            "--zero1", "--ckpt-dir", str(dir_), *extra,
            n_devices=8,
        )

    out = run(tmp_path / "ckpt")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "step " in out.stdout and "saved params+opt_state+step" in out.stdout, out.stdout

    out = run(tmp_path / "ckpt", "--resume")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "at step 2" in out.stdout and "step     4" in out.stdout, out.stdout

    def loss_at(stdout, step):
        for line in stdout.splitlines():
            parts = line.split()
            if parts[:2] == ["step", str(step)]:
                return float(parts[3])
        raise AssertionError(f"no step {step} in:\n{stdout}")

    resumed_loss = loss_at(out.stdout, 4)
    assert np.isfinite(resumed_loss), "flow loss went non-finite (NaN-sentinel masking broken?)"

    out = run(tmp_path / "uninterrupted", "--steps", "4")
    assert out.returncode == 0, out.stderr[-2000:]
    assert abs(loss_at(out.stdout, 4) - resumed_loss) < 1e-5, (
        f"resumed step-4 loss {resumed_loss} != uninterrupted {loss_at(out.stdout, 4)}"
    )
