#!/usr/bin/env python
"""
End-to-end installation validation (reference analogue:
scripts/validate_installation.py:13-80): imports, device detection, a tiny
jitted forward through every registry entry that can construct offline.
"""

import os
import sys
import traceback

# validate the in-place checkout too (every other script does this; an
# installed package simply shadows the path entry)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ok = True

    print("== Imports")
    try:
        import jax
        import jax.numpy as jnp
        from flax import nnx

        import uniception_tpu  # noqa: F401
        from uniception_tpu.models.encoders import ENCODER_CONFIGS, encoder_factory
        from uniception_tpu.models.info_sharing import INFO_SHARING_CLASSES

        print(f"  uniception_tpu {uniception_tpu.__version__}, jax {jax.__version__}")
        print(f"  devices: {jax.devices()}")
    except Exception:
        traceback.print_exc()
        return 1

    print("== Encoder registry")
    for name in sorted(ENCODER_CONFIGS):
        print(f"  {name}")

    print("== Info-sharing registry")
    for name in sorted(INFO_SHARING_CLASSES):
        print(f"  {name}")

    print("== Tiny DUSt3R forward (jitted)")
    try:
        import numpy as np

        from uniception_tpu.models.factory.dust3r import DUSt3R

        model = DUSt3R(
            name="validate", img_size=(32, 32), enc_embed_dim=64, enc_depth=1, enc_num_heads=4,
            info_sharing_dim=64, info_sharing_depth=1, info_sharing_num_heads=4, rngs=nnx.Rngs(0),
        )
        graphdef, state = nnx.split(model)

        @jax.jit
        def fwd(state, img):
            m = nnx.merge(graphdef, state)
            r1, _ = m.forward_pair(img, img)
            return r1["pts3d"]

        out = fwd(state, jnp.asarray(np.zeros((1, 3, 32, 32), np.float32)))
        assert out.shape == (1, 32, 32, 3)
        print(f"  OK — pts3d {out.shape}")
    except Exception:
        traceback.print_exc()
        ok = False

    print("VALIDATION " + ("PASSED" if ok else "FAILED"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
