#!/usr/bin/env python
"""
Report availability of the TPU stack (reference analogue:
scripts/check_dependencies.py:12-37, which reported torch/xformers/curope).
"""


def main():
    import importlib

    for mod in ["jax", "flax", "optax", "orbax.checkpoint", "numpy", "einops"]:
        try:
            m = importlib.import_module(mod)
            print(f"  {mod:18s} OK  ({getattr(m, '__version__', '?')})")
        except ImportError as e:
            print(f"  {mod:18s} MISSING ({e})")

    import jax

    print(f"  devices: {jax.devices()}")
    try:
        from jax.experimental import pallas  # noqa: F401

        on_tpu = jax.devices()[0].platform == "tpu"
        print(f"  pallas kernels: importable (TPU backend: {'yes' if on_tpu else 'no — jnp fallbacks active'})")
    except ImportError:
        print("  pallas kernels: NOT available — jnp fallbacks active")

    try:
        import torch  # noqa: F401

        print(f"  torch (for .pth checkpoint reading): OK ({torch.__version__})")
    except ImportError:
        print("  torch: missing — only .npz checkpoints loadable")


if __name__ == "__main__":
    main()
