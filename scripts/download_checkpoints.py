#!/usr/bin/env python
"""
Download UniCeption-format checkpoints (reference analogue:
scripts/download_checkpoints.py:25-54, which pulls from the AirLab MinIO
bucket `uniception` with folders encoders/, info_sharing/,
prediction_heads/, examples/).

This build runs in offline environments by default; when network access is
available the same folder layout is mirrored. Downloaded .pth files can be
used directly (torch-layout loading is native) or converted to .npz with
scripts/convert_checkpoints.py.
"""

import argparse
import os
import sys

FOLDERS = ["encoders", "info_sharing", "prediction_heads", "examples"]
DEFAULT_ENDPOINT = "airlab-share-02.andrew.cmu.edu:9000"
DEFAULT_BUCKET = "uniception"


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--endpoint", default=DEFAULT_ENDPOINT)
    parser.add_argument("--bucket", default=DEFAULT_BUCKET)
    parser.add_argument("--dest", default="checkpoints")
    parser.add_argument("--folders", nargs="*", default=FOLDERS)
    args = parser.parse_args()

    try:
        from minio import Minio
    except ImportError:
        print(
            "minio is not installed (offline build). Place checkpoints manually under "
            f"{args.dest}/{{{','.join(FOLDERS)}}}/ or install minio when network access is available.",
            file=sys.stderr,
        )
        return 1

    client = Minio(args.endpoint, secure=True)
    os.makedirs(args.dest, exist_ok=True)
    for folder in args.folders:
        for obj in client.list_objects(args.bucket, prefix=folder + "/", recursive=True):
            target = os.path.join(args.dest, obj.object_name)
            os.makedirs(os.path.dirname(target), exist_ok=True)
            print(f"  {obj.object_name} -> {target}")
            client.fget_object(args.bucket, obj.object_name, target)
    return 0


if __name__ == "__main__":
    sys.exit(main())
