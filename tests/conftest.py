"""
Test configuration.

Tests run on CPU with 8 virtual devices (the TPU-native answer to testing
multi-chip sharding without a pod — see SURVEY.md §4) and full fp32 matmul
precision so parity checks against the torch reference are meaningful.
"""

import os
import sys

# Force CPU: the environment ships JAX_PLATFORMS=axon (TPU tunnel) and a
# sitecustomize that may import jax at interpreter start, so we must
# override both the env var AND the live config value.
# Set UNICEPTION_TPU_TEST_PLATFORM=tpu to run the TPU-gated kernel tests
# (tests/ops/test_flash_attention_tpu.py etc.) on real hardware instead.
_platform = os.environ.get("UNICEPTION_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

REFERENCE_PATH = "/root/reference"


def pytest_addoption(parser):
    parser.addoption("--encoder-name", action="store", default=None, help="run encoder tests for a single encoder")
    parser.addoption("--device", action="store", default="cpu", help="cpu or tpu")
    parser.addoption("--run-slow", action="store_true", default=False, help="run slow full-size parity gates")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running full-size parity gate (enable with --run-slow)")
    config.addinivalue_line(
        "markers",
        "slow_subprocess: spawns fresh python+jax processes (minutes each; enable with --run-slow). "
        "Every CLI surface keeps one unmarked smoke test in the default tier.",
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    if config.getoption("--run-slow") or os.environ.get("UNICEPTION_TPU_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow test: pass --run-slow or set UNICEPTION_TPU_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords or "slow_subprocess" in item.keywords:
            item.add_marker(skip)


def has_reference() -> bool:
    "True when the PyTorch reference implementation is importable (used as a numeric oracle)."
    return os.path.isdir(os.path.join(REFERENCE_PATH, "uniception"))


def add_reference_to_path():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _stub_missing_optional_deps()


def _stub_missing_optional_deps():
    """The reference's package __init__ imports every encoder, some of which
    need optional deps (timm, ...) that aren't installed here. Stub just
    enough for the imports to succeed — the stubs are never executed by the
    modules we actually test against."""
    import types

    try:
        import timm  # noqa: F401
    except ImportError:
        timm = types.ModuleType("timm")
        layers = types.ModuleType("timm.layers")

        def _to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        class _DropPath:  # pragma: no cover - import stub only
            def __init__(self, *a, **k):
                raise RuntimeError("timm stub used at runtime")

        layers.DropPath = _DropPath
        layers.to_2tuple = _to_2tuple
        layers.trunc_normal_ = lambda *a, **k: None
        timm.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = layers

    # reference libs/perception_encoder/transformer.py imports Meta-internal
    # `core.probe` and `xformers`; stub the names it touches at import time.
    try:
        import core  # noqa: F401
    except ImportError:
        core = types.ModuleType("core")
        probe = types.ModuleType("core.probe")
        probe.log_stats = lambda x, name: x
        core.probe = probe
        sys.modules["core"] = core
        sys.modules["core.probe"] = probe

    try:
        import xformers.ops  # noqa: F401
    except ImportError:
        xformers = types.ModuleType("xformers")
        ops = types.ModuleType("xformers.ops")

        class _AttentionBias:  # pragma: no cover - import stub only
            pass

        ops.AttentionBias = _AttentionBias
        ops.fmha = types.SimpleNamespace(
            memory_efficient_attention=lambda *a, **k: (_ for _ in ()).throw(RuntimeError("xformers stub"))
        )
        xformers.ops = ops
        sys.modules["xformers"] = xformers
        sys.modules["xformers.ops"] = ops
