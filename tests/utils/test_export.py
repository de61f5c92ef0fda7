"""
AOT serving artifacts (utils/export.py): the exported computation must
reproduce the live module bit-for-bit from checkpoint-fed params, survive
serialization into a process that imports NO model code, and support
cross-platform (cpu+tpu) lowering from a CPU host.
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from uniception_tpu.models.factory.dust3r import DUSt3R
from uniception_tpu.utils.coldstart import load_native_state, save_native_state
from uniception_tpu.utils.export import load_serving_artifact, save_serving_artifact

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = dict(
    img_size=(32, 32), enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
    info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
)


def _model_and_inputs():
    model = DUSt3R(name="export_test", rngs=nnx.Rngs(0), **SMALL)
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    img2 = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    return model, img1, img2


def test_artifact_matches_live_module(tmp_path):
    model, img1, img2 = _model_and_inputs()
    ref1, ref2 = jax.jit(model.forward_pair)(img1, img2)

    art_path = str(tmp_path / "m.jexp")
    nsv_path = str(tmp_path / "m.nsv")
    save_serving_artifact(art_path, model, (img1, img2))
    save_native_state(nsv_path, model)

    art = load_serving_artifact(art_path)
    arrays, _ = load_native_state(nsv_path)
    fn = art.bind(arrays)
    out1, out2 = fn(img1, img2)

    for k in ref1:
        np.testing.assert_array_equal(np.asarray(ref1[k]), np.asarray(out1[k]))
    for k in ref2:
        np.testing.assert_array_equal(np.asarray(ref2[k]), np.asarray(out2[k]))


def test_artifact_rejects_missing_params(tmp_path):
    model, img1, img2 = _model_and_inputs()
    art_path = str(tmp_path / "m.jexp")
    save_serving_artifact(art_path, model, (img1, img2))
    art = load_serving_artifact(art_path)
    with pytest.raises(ValueError, match="missing"):
        art.order_params({})


def test_cross_platform_export_from_cpu(tmp_path):
    "A CPU host can lower a TPU serving artifact (jax.export multi-platform)."
    model, img1, img2 = _model_and_inputs()
    art_path = str(tmp_path / "m.jexp")
    save_serving_artifact(art_path, model, (img1, img2), platforms=("cpu", "tpu"))
    art = load_serving_artifact(art_path)
    assert set(p.lower() for p in art.header["platforms"]) == {"cpu", "tpu"}
    # still callable on the build platform
    nsv_path = str(tmp_path / "m.nsv")
    save_native_state(nsv_path, model)
    arrays, _ = load_native_state(nsv_path)
    out1, _ = art.bind(arrays)(img1, img2)
    assert np.isfinite(np.asarray(out1["pts3d"])).all()


@pytest.mark.slow_subprocess
def test_serving_process_needs_no_model_code(tmp_path):
    """The consumer side of the artifact contract: a fresh process that
    imports only utils.export + utils.coldstart (no models/, no factory)
    reproduces the build host's outputs exactly."""
    model, img1, img2 = _model_and_inputs()
    ref1, _ = jax.jit(model.forward_pair)(img1, img2)

    art_path = str(tmp_path / "m.jexp")
    nsv_path = str(tmp_path / "m.nsv")
    exp_path = str(tmp_path / "expected.npz")
    save_serving_artifact(art_path, model, (img1, img2))
    save_native_state(nsv_path, model)
    np.savez(exp_path, pts3d=np.asarray(ref1["pts3d"]), img1=np.asarray(img1), img2=np.asarray(img2))

    worker = textwrap.dedent(
        f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax; jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from uniception_tpu.utils.export import load_serving_artifact
        from uniception_tpu.utils.coldstart import load_native_state
        # guard the claim: no model module may be imported by the serving path
        art = load_serving_artifact({art_path!r})
        arrays, _ = load_native_state({nsv_path!r})
        loaded = [m for m in sys.modules if m.startswith("uniception_tpu.models")]
        assert not loaded, f"serving path pulled in model code: {{loaded}}"
        exp = np.load({exp_path!r})
        out1, out2 = art.bind(arrays)(exp["img1"], exp["img2"])
        # not bit-exact across processes: the build host ran with different
        # XLA_FLAGS (virtual-device count changes CPU reduction partitioning)
        np.testing.assert_allclose(np.asarray(out1["pts3d"]), exp["pts3d"], rtol=1e-5, atol=1e-5)
        print("SERVING_OK")
        """
    )
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORM_NAME")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", worker], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"serving process failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    assert "SERVING_OK" in r.stdout


def test_artifact_generalizes_beyond_dust3r(tmp_path):
    """Any nnx module exports: the N-view pointmap model through a callable
    ``method`` (its __call__ takes a LIST of views, so the entry point is
    wrapped) — exercising the method=callable path too."""
    from uniception_tpu.models.factory.multiview import MultiViewPointmapModel

    model = MultiViewPointmapModel(
        name="export_mv", num_views=3, img_size=(32, 32), attention_type="global",
        enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
        info_sharing_dim=64, info_sharing_depth=2, info_sharing_num_heads=4,
        rngs=nnx.Rngs(0),
    )
    rng = np.random.RandomState(0)
    views = [jnp.asarray(rng.randn(1, 3, 32, 32).astype(np.float32)) for _ in range(3)]
    entry = lambda m, v1, v2, v3: m([v1, v2, v3])
    ref = entry(model, *views)

    art_path = str(tmp_path / "mv.jexp")
    nsv_path = str(tmp_path / "mv.nsv")
    save_serving_artifact(art_path, model, tuple(views), method=entry)
    save_native_state(nsv_path, model)

    art = load_serving_artifact(art_path)
    arrays, _ = load_native_state(nsv_path)
    out = art.bind(arrays)(*views)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r["pts3d"]), np.asarray(o["pts3d"]), atol=1e-5, rtol=1e-5)
