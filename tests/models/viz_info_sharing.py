#!/usr/bin/env python
"""
Qualitative info-sharing PCA visualization (reference analogue:
tests/models/info_sharing/viz_mulit_view_cross_attn_transformers.py:26-80):
runs two views through an encoder + a two-view cross-attention transformer
(IFR), projects the final and intermediate per-view features to 3 PCA
components, and saves RGB maps under local/pca_images/info_sharing/.

Works offline (random weights); pass --checkpoint to visualize a pretrained
two-view transformer like the reference does.

Run directly:
    python tests/models/viz_info_sharing.py [--images a.png b.png]
        [--checkpoint two_view_transformer.pth]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.."))

import numpy as np

from tests.models.viz_image_encoders import pca_rgb


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--images", nargs=2, default=None, help="two input images")
    parser.add_argument("--checkpoint", default=None, help="pretrained two-view transformer .pth")
    parser.add_argument("--encoder-checkpoint", default=None, help="pretrained CroCo encoder .pth")
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--out-dir", default="local/pca_images/info_sharing")
    args = parser.parse_args()

    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.encoders.base import ViTEncoderInput
    from uniception_tpu.models.encoders.croco import CroCoEncoder
    from uniception_tpu.models.encoders.image_normalizations import normalize_image
    from uniception_tpu.models.info_sharing.base import MultiViewTransformerInput
    from uniception_tpu.models.info_sharing.cross_attention_transformer import (
        MultiViewCrossAttentionTransformerIFR,
    )
    from uniception_tpu.ops.rope import Rope2D

    size = (args.size, args.size)
    encoder = CroCoEncoder(
        name="croco",
        data_norm_type="dust3r",
        patch_embed_cls="PatchEmbedDust3R",
        img_size=size,
        pretrained_checkpoint_path=args.encoder_checkpoint,
        rngs=nnx.Rngs(0),
    )
    # reference viz config: indices at depth*2//4 and *3//4, unnormed (:33-41)
    transformer = MultiViewCrossAttentionTransformerIFR(
        name="two_view_viz",
        input_embed_dim=encoder.enc_embed_dim,
        num_views=2,
        indices=[12 * 2 // 4, 12 * 3 // 4],
        norm_intermediate=False,
        intermediates_only=False,
        custom_positional_encoding=Rope2D(100.0),
        pretrained_checkpoint_path=args.checkpoint,
        rngs=nnx.Rngs(1),
    )

    if args.images:
        from PIL import Image

        imgs = []
        for path in args.images:
            arr = np.asarray(Image.open(path).convert("RGB").resize(size[::-1]), np.float32) / 255.0
            imgs.append(normalize_image(arr.transpose(2, 0, 1), "dust3r")[None])
    else:
        rng = np.random.RandomState(0)
        imgs = [rng.randn(1, 3, *size).astype(np.float32) for _ in range(2)]

    feats = [
        encoder(ViTEncoderInput(image=jnp.asarray(im), data_norm_type="dust3r")).features for im in imgs
    ]
    final, intermediates = transformer(MultiViewTransformerInput(features=feats))

    os.makedirs(args.out_dir, exist_ok=True)
    saved = []

    def save(tag, multi_view_output):
        # joint PCA across both views so colors are comparable (like the reference)
        both = np.concatenate([np.asarray(f) for f in multi_view_output.features], axis=0)
        rgb = pca_rgb(both)
        for view_idx in range(rgb.shape[0]):
            path = os.path.join(args.out_dir, f"{tag}_view{view_idx}.png")
            try:
                from PIL import Image

                Image.fromarray((rgb[view_idx] * 255).astype(np.uint8)).save(path)
                saved.append(path)
            except ImportError:
                np.save(path.replace(".png", ".npy"), rgb[view_idx])
                saved.append(path.replace(".png", ".npy"))

    save("final", final)
    for i, inter in enumerate(intermediates):
        save(f"intermediate{i}", inter)

    assert len(saved) >= 6, saved  # final + 2 intermediates, 2 views each
    print("saved:\n  " + "\n  ".join(saved))


if __name__ == "__main__":
    main()
