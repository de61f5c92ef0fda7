#!/usr/bin/env python
"""
Qualitative encoder-feature PCA visualization (reference analogue:
tests/models/encoders/viz_image_encoders.py:23-80): runs images through an
encoder, projects patch features to 3 PCA components, and saves RGB maps
under local/pca_images/.

Run directly: python tests/models/viz_image_encoders.py --encoder croco
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.."))

import numpy as np


def pca_rgb(features_bchw: np.ndarray) -> np.ndarray:
    "Project (B, C, H, W) features to (B, H, W, 3) PCA-RGB in [0, 1]."
    B, C, H, W = features_bchw.shape
    flat = features_bchw.transpose(0, 2, 3, 1).reshape(-1, C)
    flat = flat - flat.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:3].T
    lo, hi = proj.min(axis=0), proj.max(axis=0)
    proj = (proj - lo) / np.maximum(hi - lo, 1e-8)
    return proj.reshape(B, H, W, 3)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--encoder", default="croco")
    parser.add_argument("--image", default=None)
    parser.add_argument("--out-dir", default="local/pca_images")
    args = parser.parse_args()

    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.encoders import encoder_factory
    from uniception_tpu.models.encoders.base import ViTEncoderInput
    from uniception_tpu.models.encoders.image_normalizations import normalize_image

    enc_kwargs = {"croco": dict(name="croco", data_norm_type="croco")}.get(
        args.encoder, dict(name=args.encoder, data_norm_type=args.encoder)
    )
    enc = encoder_factory(args.encoder, rngs=nnx.Rngs(0), **enc_kwargs)
    p = getattr(enc, "patch_size", 16)
    size = (14 * p, 14 * p)

    if args.image:
        from PIL import Image

        img01 = np.asarray(Image.open(args.image).convert("RGB").resize(size[::-1]), np.float32) / 255.0
        img = normalize_image(img01.transpose(2, 0, 1), enc.data_norm_type)[None]
    else:
        img = np.random.RandomState(0).randn(1, 3, *size).astype(np.float32)

    out = enc(ViTEncoderInput(image=jnp.asarray(img), data_norm_type=enc.data_norm_type))
    rgb = pca_rgb(np.asarray(out.features))

    os.makedirs(args.out_dir, exist_ok=True)
    try:
        from PIL import Image

        Image.fromarray((rgb[0] * 255).astype(np.uint8)).resize(size[::-1], Image.NEAREST).save(
            os.path.join(args.out_dir, f"{args.encoder}_pca.png")
        )
        print(f"wrote {args.out_dir}/{args.encoder}_pca.png")
    except ImportError:
        np.save(os.path.join(args.out_dir, f"{args.encoder}_pca.npy"), rgb)
        print(f"PIL missing; wrote {args.out_dir}/{args.encoder}_pca.npy")


if __name__ == "__main__":
    main()
