"""
examples/train_dust3r.py must run end-to-end (pipeline -> sharded step ->
checkpoint) on the virtual CPU mesh, exactly as documented in its header.
"""

import os
import signal
import subprocess
import sys

import jax
import pytest

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(tmp_path, *extra):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split() if "device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=8"])
    return subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "train_dust3r.py"),
            "--steps", "2", "--dataset-size", "16", "--batch", "8",
            "--zero1", "--ckpt-dir", str(tmp_path / "ckpt"), *extra,
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.slow_subprocess
def test_train_example_runs_saves_and_resumes(tmp_path):
    out = _run(tmp_path)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "step " in out.stdout and "saved params+opt_state+step" in out.stdout, out.stdout
    assert (tmp_path / "ckpt").exists()

    # resume leg: restored state must re-shard (zero1) and continue from step 2
    out = _run(tmp_path, "--resume")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "at step 2" in out.stdout, out.stdout
    assert "step     4" in out.stdout, out.stdout

    def loss_at(stdout, step):
        for line in stdout.splitlines():
            parts = line.split()
            if parts[:2] == ["step", str(step)]:
                return float(parts[3])
        raise AssertionError(f"no step {step} in:\n{stdout}")

    resumed_loss = loss_at(out.stdout, 4)

    # uninterrupted oracle: interrupted+resumed training must equal a
    # straight 4-step run — params/opt state round-trip through Orbax AND
    # the DeterministicSampler replays the identical batch stream
    out = _run(tmp_path / "uninterrupted", "--steps", "4")
    assert out.returncode == 0, out.stderr[-2000:]
    assert abs(loss_at(out.stdout, 4) - resumed_loss) < 1e-5, (
        f"resumed step-4 loss {resumed_loss} != uninterrupted {loss_at(out.stdout, 4)}"
    )


@pytest.mark.slow_subprocess
def test_train_example_preemption(tmp_path):
    """SIGTERM mid-run (TPU maintenance-event semantics) must checkpoint at
    the next step boundary and exit 0; the resumed run must match an
    uninterrupted oracle (PreemptionGuard + DeterministicSampler +
    Orbax round-trip)."""
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONUNBUFFERED"] = "1"
    flags = [f for f in env.get("XLA_FLAGS", "").split() if "device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=8"])
    base = [
        sys.executable,
        os.path.join(REPO, "examples", "train_dust3r.py"),
        "--dataset-size", "16", "--batch", "8",
        "--ckpt-dir", str(tmp_path / "ckpt"),
    ]
    # --steps 12 prints every step, so the first "step" line arrives early
    proc = subprocess.Popen(
        base + ["--steps", "12", "--preempt-safe", "--ckpt-every", "3"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if line.startswith("step "):
            proc.send_signal(signal.SIGTERM)
            break
    out, err = proc.communicate(timeout=600)
    lines.append(out)
    stdout = "".join(lines)
    assert proc.returncode == 0, err[-2000:]
    assert "preempted: saved at step" in stdout, stdout
    saved_step = int(stdout.split("preempted: saved at step")[1].split(";")[0])
    assert 0 < saved_step < 12
    assert (tmp_path / "ckpt").exists()

    def loss_at(stdout, step):
        for line in stdout.splitlines():
            parts = line.split()
            if parts[:2] == ["step", str(step)]:
                return float(parts[3])
        raise AssertionError(f"no step {step} in:\n{stdout}")

    # resume to step 12, then compare against a straight 12-step run
    out = subprocess.run(
        base + ["--steps", str(12 - saved_step), "--resume"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"at step {saved_step}" in out.stdout, out.stdout
    resumed_loss = loss_at(out.stdout, 12)

    oracle = subprocess.run(
        base[:-2] + ["--ckpt-dir", str(tmp_path / "oracle"), "--steps", "12"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert oracle.returncode == 0, oracle.stderr[-2000:]
    assert abs(loss_at(oracle.stdout, 12) - resumed_loss) < 1e-5, (
        f"preempted+resumed step-12 loss {resumed_loss} != uninterrupted {loss_at(oracle.stdout, 12)}"
    )


@pytest.mark.slow_subprocess
def test_train_example_mixed_ar(tmp_path):
    "Mixed landscape/portrait ManyAR training (landscape_only + true_shapes in the batch pytree)."
    out = _run(tmp_path, "--mixed-ar", "--norm-loss")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "step " in out.stdout, out.stdout


def test_train_example_smoke(tmp_path):
    "Default-tier smoke: the training CLI runs one step and saves (single subprocess)."
    out = _run(tmp_path, "--steps", "1")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "step " in out.stdout and "saved params+opt_state+step" in out.stdout, out.stdout


@pytest.mark.slow_subprocess
def test_train_example_lora(tmp_path):
    """--lora: adapters wrap the trunk linears and only they train (the
    first-step-matches / frozen-base proof is in tests/nn/test_lora.py;
    this exercises the CLI wiring end-to-end incl. checkpointing the
    wrapped key layout)."""
    out = _run(tmp_path, "--lora", "4")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "lora: wrapped" in out.stdout, out.stdout
    assert "step " in out.stdout and "saved params+opt_state+step" in out.stdout, out.stdout
