"""
examples/serve_dust3r.py must run end-to-end from BOTH checkpoint formats:
the torch-layout interchange .npz (load_torch_state_dict path) and the
native serving checkpoint written by scripts/convert_checkpoints.py
--serving (coldstart abstract-construct + materialize path), at a tiny
config, producing identical throughput-loop output lines.
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

TINY = dict(img_size=64, enc_dim=96, enc_depth=2, enc_heads=4, dec_dim=64, dec_depth=2, dec_heads=4)


def _flags(d):
    return [f"--{k.replace('_', '-')}={v}" for k, v in d.items()]


def _run(script, *argv, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split() if "device_count" not in f
    )
    return subprocess.run(
        [sys.executable, os.path.join(REPO, *script), *argv],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    "Tiny torch-layout interchange checkpoint with random (eager-init) weights."
    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.utils.checkpoint import save_checkpoint
    from uniception_tpu.utils.torch_compat import state_dict_from_module

    model = DUSt3R(
        name="dust3r_serve",
        img_size=(TINY["img_size"],) * 2,
        patch_embed_cls="ManyAR_PatchEmbed",
        enc_embed_dim=TINY["enc_dim"],
        enc_depth=TINY["enc_depth"],
        enc_num_heads=TINY["enc_heads"],
        info_sharing_dim=TINY["dec_dim"],
        info_sharing_depth=TINY["dec_depth"],
        info_sharing_num_heads=TINY["dec_heads"],
        scan_blocks=True,
        dtype=jnp.bfloat16,
        rngs=nnx.Rngs(0),
    )
    path = str(tmp_path_factory.mktemp("serve") / "torch.npz")
    save_checkpoint(path, state_dict_from_module(model))
    return path


def test_serve_from_torch_layout_checkpoint(torch_ckpt):
    out = _run(
        ("examples", "serve_dust3r.py"),
        "--checkpoint", torch_ckpt, "--pairs", "2", "--batch", "1", *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pairs/s" in out.stdout, out.stdout


@pytest.mark.slow_subprocess
def test_convert_serving_then_serve(torch_ckpt, tmp_path):
    "converter --serving -> native ckpt -> serve cold-start path."
    native = str(tmp_path / "serve_native.npz")
    out = _run(
        ("scripts", "convert_checkpoints.py"),
        torch_ckpt, native, "--serving", *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "native serving checkpoint" in out.stdout, out.stdout

    from uniception_tpu.utils.coldstart import is_native_state

    assert is_native_state(native)
    # bf16 pre-cast halves the payload vs the f32 interchange file
    assert os.path.getsize(native) < 0.75 * os.path.getsize(torch_ckpt)

    out = _run(
        ("examples", "serve_dust3r.py"),
        "--checkpoint", native, "--pairs", "2", "--batch", "1", *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pairs/s" in out.stdout, out.stdout


def _build(cfg, **over):
    from uniception_tpu.models.factory.dust3r import DUSt3R

    return DUSt3R(
        name="dust3r_serve",
        img_size=(cfg["img_size"],) * 2,
        patch_embed_cls="ManyAR_PatchEmbed",
        enc_embed_dim=cfg["enc_dim"],
        enc_depth=cfg["enc_depth"],
        enc_num_heads=cfg["enc_heads"],
        info_sharing_dim=cfg["dec_dim"],
        info_sharing_depth=cfg["dec_depth"],
        info_sharing_num_heads=cfg["dec_heads"],
        scan_blocks=True,
        dtype=jnp.bfloat16,
        rngs=nnx.Rngs(0),
        **over,
    )


@pytest.mark.slow_subprocess
def test_convert_serving_int8_offline_matches_online(tmp_path):
    """--serving --int8 writes offline-quantized weights that serve
    bit-identically to online quantize_trunk at serve time, in the
    packed .nsv container (default policy=all, asym=none — the converter
    records both in metadata and the serve loader reconstructs from them)."""
    from uniception_tpu.nn.quant import quantize_trunk
    from uniception_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from uniception_tpu.utils.coldstart import (
        abstract_construct,
        is_native_state,
        load_native_state,
        materialize,
    )
    from uniception_tpu.utils.torch_compat import load_torch_state_dict, state_dict_from_module

    # wide enough that quantize_linears' min_params threshold (1<<16)
    # actually converts the encoder projections
    cfg = dict(img_size=64, enc_dim=256, enc_depth=2, enc_heads=4, dec_dim=64, dec_depth=2, dec_heads=4)
    src = str(tmp_path / "torch.npz")
    save_checkpoint(src, state_dict_from_module(_build(cfg)))

    native = str(tmp_path / "serve_int8.nsv")
    out = _run(
        ("scripts", "convert_checkpoints.py"),
        src, native, "--serving", "--int8", *_flags(cfg),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "int8" in out.stdout, out.stdout
    assert is_native_state(native)

    # online path: torch-layout load -> bf16 cast -> quantize at serve time
    m_on = abstract_construct(lambda: _build(cfg))
    ckpt = load_checkpoint(src)
    load_torch_state_dict(m_on, ckpt["model"], ignore=m_on.checkpoint_alias_patterns(), to_device=False, verbose=False)
    m_on = materialize(m_on, param_dtype=jnp.bfloat16)
    n_q = quantize_trunk(m_on, "all")
    assert n_q > 0

    # offline path: abstract Int8Linear tree filled from the int8 checkpoint,
    # reconstructing the module tree from the RECORDED policy metadata
    arrays, meta = load_native_state(native)
    assert meta["quant"] == "int8-w8a8-dynamic" and meta["quant_layers"] == n_q
    assert meta["quant_policy"] == "all" and meta["quant_asym"] == "none"

    def ctor_q():
        m = _build(cfg)
        quantize_trunk(m, meta["quant_policy"], asym=meta["quant_asym"])
        return m

    m_off = abstract_construct(ctor_q)
    m_off = materialize(m_off, arrays=arrays, param_dtype=jnp.bfloat16)

    # int8 leaves present and scales stayed f32
    _, st = nnx.split(m_off)
    dtypes = {str(getattr(leaf, "dtype", None)) for leaf in jax.tree.leaves(st)}
    assert "int8" in dtypes

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    img2 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    r_on, _ = m_on.forward_pair(img1, img2)
    r_off, _ = m_off.forward_pair(img1, img2)
    np.testing.assert_array_equal(np.asarray(r_on["pts3d"]), np.asarray(r_off["pts3d"]))

    # and the serve example consumes it end-to-end
    out = _run(
        ("examples", "serve_dust3r.py"),
        "--checkpoint", native, "--pairs", "2", "--batch", "1", *_flags(cfg),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "serving int8" in out.stdout and "pairs/s" in out.stdout, out.stdout


@pytest.mark.slow_subprocess
def test_serve_compile_cache_warm_restart(torch_ckpt, tmp_path):
    """--compile-cache must persist the jitted executables: the first serve
    process populates the cache directory, an identical second process
    hits it (no new entries) and still serves correctly."""
    from uniception_tpu.utils.compile_cache import cache_entries

    cache = str(tmp_path / "xla_cache")
    argv = (
        "--checkpoint", torch_ckpt, "--pairs", "2", "--batch", "1",
        "--compile-cache", cache, *_flags(TINY),
    )
    out = _run(("examples", "serve_dust3r.py"), *argv)
    assert out.returncode == 0, out.stderr[-2000:]
    n_cold = cache_entries(cache)
    assert n_cold > 0, "first run persisted no compiled executables"

    out = _run(("examples", "serve_dust3r.py"), *argv)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pairs/s" in out.stdout, out.stdout
    n_warm = cache_entries(cache)
    assert n_warm == n_cold, f"warm restart recompiled: {n_cold} -> {n_warm} cache entries"


@pytest.mark.slow_subprocess
def test_serve_aot_artifact_ladder(torch_ckpt, tmp_path):
    """The full AOT cold-start ladder: convert --serving -> --save-artifact
    -> serve with --artifact (no construction, no trace), same output line."""
    native = str(tmp_path / "serve_native.nsv")
    out = _run(
        ("scripts", "convert_checkpoints.py"),
        torch_ckpt, native, "--serving", *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]

    art = str(tmp_path / "serve.jexp")
    out = _run(
        ("examples", "serve_dust3r.py"),
        "--checkpoint", native, "--batch", "1", "--save-artifact", art, *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "serving artifact written" in out.stdout, out.stdout
    assert os.path.exists(art)

    out = _run(
        ("examples", "serve_dust3r.py"),
        "--artifact", art, "--checkpoint", native, "--pairs", "2", "--batch", "1", *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "AOT artifact bound" in out.stdout and "pairs/s" in out.stdout, out.stdout


@pytest.mark.slow_subprocess
def test_serve_outputs_match_across_formats(torch_ckpt, tmp_path):
    "Both load paths must produce the same weights: compare forward outputs."
    from uniception_tpu.models.factory.dust3r import DUSt3R
    from uniception_tpu.utils.checkpoint import load_checkpoint
    from uniception_tpu.utils.coldstart import (
        abstract_construct,
        load_native_state,
        materialize,
    )
    from uniception_tpu.utils.torch_compat import load_torch_state_dict

    native = str(tmp_path / "serve_native.npz")
    out = _run(
        ("scripts", "convert_checkpoints.py"),
        torch_ckpt, native, "--serving", *_flags(TINY),
    )
    assert out.returncode == 0, out.stderr[-2000:]

    def ctor():
        return DUSt3R(
            name="dust3r_serve",
            img_size=(TINY["img_size"],) * 2,
            patch_embed_cls="ManyAR_PatchEmbed",
            enc_embed_dim=TINY["enc_dim"],
            enc_depth=TINY["enc_depth"],
            enc_num_heads=TINY["enc_heads"],
            info_sharing_dim=TINY["dec_dim"],
            info_sharing_depth=TINY["dec_depth"],
            info_sharing_num_heads=TINY["dec_heads"],
            scan_blocks=True,
            dtype=jnp.bfloat16,
            rngs=nnx.Rngs(0),
        )

    m_t = abstract_construct(ctor)
    ckpt = load_checkpoint(torch_ckpt)
    load_torch_state_dict(m_t, ckpt["model"], ignore=m_t.checkpoint_alias_patterns(), to_device=False)
    m_t = materialize(m_t, param_dtype=jnp.bfloat16)

    m_n = abstract_construct(ctor)
    arrays, _ = load_native_state(native)
    m_n = materialize(m_n, arrays=arrays, param_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    img2 = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    r_t, _ = m_t.forward_pair(img1, img2)
    r_n, _ = m_n.forward_pair(img1, img2)
    np.testing.assert_array_equal(np.asarray(r_t["pts3d"]), np.asarray(r_n["pts3d"]))


@pytest.mark.slow_subprocess
def test_serve_bucketed_from_checkpoint(torch_ckpt):
    """--buckets: arbitrary-size pair stream through the aspect-bucket family
    (one loaded state, per-bucket abstract graphdefs), incl. int8 online
    quantization of the shared state."""
    out = _run(
        ("examples", "serve_dust3r.py"),
        "--buckets", "--checkpoint", torch_ckpt, "--pairs", "5", "--batch", "2",
        *_flags(TINY), timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "buckets pre-warmed" in out.stdout, out.stdout
    assert "pairs/s" in out.stdout, out.stdout
    assert "native orientation" in out.stdout, out.stdout

    out = _run(
        ("examples", "serve_dust3r.py"),
        "--buckets", "--int8", "--checkpoint", torch_ckpt, "--pairs", "3", "--batch", "2",
        *_flags(TINY), timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "int8-quantized" in out.stdout, out.stdout
    assert "pairs/s" in out.stdout, out.stdout


@pytest.mark.slow_subprocess
def test_serve_bucketed_aot_artifacts(torch_ckpt, tmp_path):
    "--buckets --save-artifact exports one AOT artifact per canvas; --buckets --artifact serves from them."
    native = str(tmp_path / "bkt.nsv")
    out = _run(("scripts", "convert_checkpoints.py"), torch_ckpt, native, "--serving", *_flags(TINY))
    assert out.returncode == 0, out.stderr[-2000:]

    art = str(tmp_path / "bkt.jexp")
    out = _run(
        ("examples", "serve_dust3r.py"),
        "--buckets", "--save-artifact", art, "--checkpoint", native, "--batch", "2",
        *_flags(TINY), timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "per-bucket serving artifacts" in out.stdout, out.stdout
    import glob

    assert len(glob.glob(str(tmp_path / "bkt.*x*.jexp"))) >= 2

    out = _run(
        ("examples", "serve_dust3r.py"),
        "--buckets", "--artifact", art, "--checkpoint", native, "--batch", "2", "--pairs", "4",
        *_flags(TINY), timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "AOT artifacts bound" in out.stdout, out.stdout
    assert "pairs/s" in out.stdout, out.stdout


@pytest.mark.slow_subprocess
def test_convert_serving_int8_embeds_gptq_codes(tmp_path):
    """--serving --int8 --gptq stores the calibrated GPTQ codes in the
    packed checkpoint in place of RTN (same module tree/metadata, only the
    integer codes differ), and the serve-side abstract+materialize load
    reconstructs them exactly."""
    import numpy as np

    from uniception_tpu.nn.gptq import gptq_int8
    from uniception_tpu.nn.quant import quantize_trunk
    from uniception_tpu.utils.checkpoint import save_checkpoint
    from uniception_tpu.utils.coldstart import abstract_construct, load_native_state, materialize
    from uniception_tpu.utils.torch_compat import state_dict_from_module

    cfg = dict(img_size=64, enc_dim=256, enc_depth=2, enc_heads=4, dec_dim=64, dec_depth=2, dec_heads=4)
    model = _build(cfg)
    src = str(tmp_path / "torch.npz")
    save_checkpoint(src, state_dict_from_module(model))

    # GPTQ one stacked layer (enc fc1) against a random SPD Hessian; keys in
    # the loop-layout format calibrate_gptq.py emits
    k = np.asarray(model.encoder.enc_blocks.mlp.fc1.kernel[...], np.float32)  # (depth, in, out)
    rng = np.random.RandomState(0)
    codes = {}
    expected = []
    for i in range(k.shape[0]):
        A = rng.randn(k.shape[1], 4 * k.shape[1]).astype(np.float64)
        H = A @ A.T / A.shape[1] + 0.1 * np.eye(k.shape[1])
        w_q, w_s = gptq_int8(k[i], H)
        codes[f"encoder.enc_blocks.{i}.mlp.fc1.w_q"] = w_q
        codes[f"encoder.enc_blocks.{i}.mlp.fc1.w_scale"] = w_s
        expected.append(w_q)
    gptq_npz = str(tmp_path / "codes.npz")
    np.savez(gptq_npz, **codes)

    native = str(tmp_path / "serve_int8_gptq.nsv")
    out = _run(
        ("scripts", "convert_checkpoints.py"),
        src, native, "--serving", "--int8", f"--gptq={gptq_npz}", *_flags(cfg),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "embedded GPTQ codes for 1 layers" in out.stdout, out.stdout

    arrays, meta = load_native_state(native)
    assert meta["quant_gptq_layers"] == 1

    def ctor_q():
        m = _build(cfg)
        quantize_trunk(m, meta["quant_policy"], asym=meta["quant_asym"])
        return m

    m_loaded = materialize(abstract_construct(ctor_q), arrays=arrays)
    got = np.asarray(m_loaded.encoder.enc_blocks.mlp.fc1.w_q[...])
    np.testing.assert_array_equal(got, np.stack(expected))
    # and it really differs from RTN (the compensation moved some codes)
    m_rtn = _build(cfg)
    quantize_trunk(m_rtn, "all")
    rtn = np.asarray(m_rtn.encoder.enc_blocks.mlp.fc1.w_q[...])
    assert (got != rtn).any()
