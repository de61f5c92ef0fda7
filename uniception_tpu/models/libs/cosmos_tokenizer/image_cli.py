#!/usr/bin/env python
"""
Cosmos image tokenizer CLI (reference analogue: image_cli.py): autoencode
images through a CI/DI tokenizer and report reconstruction error.
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tokenizer", default="CI", choices=["CI", "DI"])
    parser.add_argument("--spatial-compression", type=int, default=8)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--image", default=None, help="input image path (falls back to random)")
    parser.add_argument("--output", default=None, help="reconstruction output path")
    args = parser.parse_args()

    from uniception_tpu.models.libs.cosmos_tokenizer.image_lib import ImageTokenizer

    tok = ImageTokenizer(args.tokenizer, args.spatial_compression, args.checkpoint)

    if args.image:
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 127.5 - 1.0
        x = img.transpose(2, 0, 1)[None]
    else:
        x = np.random.RandomState(0).randn(1, 3, 256, 256).astype(np.float32).clip(-1, 1)

    recon = tok.autoencode(x)
    err = np.abs(recon - x).mean()
    print(f"autoencode: input {x.shape} -> recon {recon.shape}, mean abs err {err:.4f}")
    if args.output:
        from PIL import Image

        out = ((recon[0].transpose(1, 2, 0) + 1) * 127.5).clip(0, 255).astype(np.uint8)
        Image.fromarray(out).save(args.output)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
