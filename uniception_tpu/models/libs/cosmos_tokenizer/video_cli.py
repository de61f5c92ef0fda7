#!/usr/bin/env python
"""
Cosmos video tokenizer CLI (reference analogue: video_cli.py): autoencode a
(1 + 8n)-frame clip through a CV/DV tokenizer and report reconstruction error.
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tokenizer", default="CV", choices=["CV", "DV"])
    parser.add_argument("--spatial-compression", type=int, default=8)
    parser.add_argument("--temporal-compression", type=int, default=8)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--frames", type=int, default=9)
    parser.add_argument("--size", type=int, default=128)
    args = parser.parse_args()

    from uniception_tpu.models.libs.cosmos_tokenizer.video_lib import CausalVideoTokenizer

    tok = CausalVideoTokenizer(args.tokenizer, args.spatial_compression, args.temporal_compression, args.checkpoint)
    x = np.random.RandomState(0).randn(1, 3, args.frames, args.size, args.size).astype(np.float32).clip(-1, 1)
    recon = tok.autoencode(x)
    print(f"autoencode: input {x.shape} -> recon {recon.shape}, mean abs err {np.abs(recon - x).mean():.4f}")


if __name__ == "__main__":
    main()
