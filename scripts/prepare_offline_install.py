#!/usr/bin/env python
"""
Prepare an offline/air-gapped install bundle (reference analogue:
scripts/prepare_offline_install.py): downloads wheels for the dependency
set and emits an install_offline.sh.
"""

import argparse
import os
import subprocess
import sys

DEPS = ["jax[tpu]", "flax", "optax", "orbax-checkpoint", "numpy", "einops", "pytest", "torch --index-url https://download.pytorch.org/whl/cpu"]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dest", default="offline_wheels")
    args = parser.parse_args()

    os.makedirs(args.dest, exist_ok=True)
    for dep in DEPS:
        cmd = [sys.executable, "-m", "pip", "download", "-d", args.dest] + dep.split()
        print("$", " ".join(cmd))
        try:
            subprocess.run(cmd, check=True)
        except subprocess.CalledProcessError as e:
            print(f"  download failed ({e}); continuing (offline environment?)", file=sys.stderr)

    script = os.path.join(args.dest, "install_offline.sh")
    with open(script, "w") as f:
        f.write("#!/bin/sh\n# Offline install for uniception-tpu\n")
        f.write(f'pip install --no-index --find-links "$(dirname "$0")" jax flax optax orbax-checkpoint numpy einops pytest torch\n')
        f.write("pip install -e .\n")
    os.chmod(script, 0o755)
    print(f"wrote {script}")


if __name__ == "__main__":
    main()
