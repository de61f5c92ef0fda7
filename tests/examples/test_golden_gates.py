"""
scripts/run_golden_gates.py --dry-run must execute the complete
golden-gate flow on random weights: converter (plain + --serving --int8),
checkpoint discovery, example forward with --overrides, golden dump, and
a PASSING gate comparison.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow_subprocess
def test_golden_gates_dry_run():
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_golden_gates.py"), "--dry-run"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Verified against goldens!" in out.stdout, out.stdout
    assert "dry run PASSED" in out.stdout, out.stdout


@pytest.mark.slow_subprocess
def test_golden_gates_real_mode_reports_missing_checkpoints(tmp_path):
    "Real mode without raw checkpoints must explain itself and exit nonzero."
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "run_golden_gates.py"),
            "--raw", str(tmp_path / "nonexistent"),
        ],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 1
    assert "no raw torch checkpoints" in out.stdout
