"""Cosmos tokenizer autoencoding example (TPU-native).

Analogue of reference examples/models/cosmos/autoencoding.py: encode an
image with the Cosmos continuous-image encoder (CosmosEncoder), decode the
latent back with the Cosmos decoder head (CosmosSingleChannel), and save an
original/reconstruction side-by-side.

Works fully offline:
    * with pretrained checkpoints (--encoder-ckpt/--decoder-ckpt, the
      reference's Cosmos-Tokenizer-CI8x8 layout): asserts the reconstruction
      error bound (mean |orig - recon| < 0.1 in [-1, 1] space) on the input
      image (bundled path or --image; falls back to a synthetic gradient
      image when none is given).
    * without checkpoints: random init; with the torch reference available
      (/root/reference) it copies identical random weights into the torch
      modules and asserts encode+decode PARITY <= 5e-4 — an offline numeric
      gate that needs no downloads.

Usage:
    python examples/models/cosmos/autoencoding.py [--image path.png]
        [--encoder-ckpt enc.pth --decoder-ckpt dec.pth] [--patch-size 8]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))))


def load_image(path, size=256):
    "Load an RGB image in [-1, 1], (1, 3, H, W); synthetic gradient if path is None."
    if path is None:
        y, x = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
        img = np.stack([x, y, 0.5 * (x + y)], axis=0)[None]  # smooth gradients
        return img * 2.0 - 1.0
    try:
        from PIL import Image

        im = Image.open(path).convert("RGB")
        w, h = im.size
        im = im.crop((0, 0, w - w % 16, h - h % 16))
        arr = np.asarray(im).astype(np.float32) / 255.0
        return np.transpose(arr, (2, 0, 1))[None] * 2.0 - 1.0
    except ImportError:
        print("PIL unavailable; using synthetic image")
        return load_image(None, size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None)
    ap.add_argument("--encoder-ckpt", default=None)
    ap.add_argument("--decoder-ckpt", default=None)
    ap.add_argument("--patch-size", type=int, default=8)
    ap.add_argument("--out", default=None, help="output side-by-side png path")
    args = ap.parse_args()

    import jax.numpy as jnp
    from flax import nnx

    from uniception_tpu.models.encoders.base import ViTEncoderInput
    from uniception_tpu.models.encoders.cosmos import CosmosEncoder
    from uniception_tpu.models.prediction_heads.cosmos import CosmosSingleChannel

    encoder = CosmosEncoder(
        name="cosmos",
        patch_size=args.patch_size,
        pretrained_checkpoint_path=args.encoder_ckpt,
        rngs=nnx.Rngs(0),
    )
    decoder = CosmosSingleChannel(
        patch_size=args.patch_size,
        pretrained_checkpoint_path=args.decoder_ckpt,
        rngs=nnx.Rngs(1),
    )

    img = load_image(args.image)
    latent = encoder(ViTEncoderInput(image=jnp.asarray(img), data_norm_type="cosmos")).features
    recon = np.asarray(decoder(latent))
    print(f"image {img.shape} -> latent {latent.shape} -> recon {recon.shape}")
    assert recon.shape == img.shape, (recon.shape, img.shape)
    assert np.isfinite(recon).all(), "non-finite reconstruction"

    if args.encoder_ckpt and args.decoder_ckpt:
        err = float(np.abs(recon - img).mean())
        print(f"reconstruction mean abs error (pretrained): {err:.4f}")
        assert err < 0.1, f"reconstruction error bound violated: {err}"
    elif os.path.isdir("/root/reference/uniception"):
        # offline numeric gate: torch reference with IDENTICAL random weights
        from tests.conftest import add_reference_to_path

        add_reference_to_path()  # also stubs the reference's optional deps (timm, ...)
        import torch
        from uniception.models.encoders.base import ViTEncoderInput as TViTIn
        from uniception.models.encoders.cosmos import CosmosEncoder as TCosmosEncoder
        from uniception.models.prediction_heads.cosmos import CosmosSingleChannel as TCosmosDecoder

        from uniception_tpu.utils.torch_compat import state_dict_from_module

        t_enc = TCosmosEncoder(name="cosmos", patch_size=args.patch_size)
        t_dec = TCosmosDecoder(patch_size=args.patch_size)
        t_enc.load_state_dict({k: torch.from_numpy(v) for k, v in state_dict_from_module(encoder).items()})
        t_dec.load_state_dict({k: torch.from_numpy(v) for k, v in state_dict_from_module(decoder).items()})
        t_enc.eval(), t_dec.eval()
        with torch.no_grad():
            t_latent = t_enc(TViTIn("cosmos", torch.from_numpy(img))).features
            t_recon = t_dec(t_latent).numpy()
        lat_err = float(np.abs(np.asarray(latent) - t_latent.numpy()).max())
        rec_err = float(np.abs(recon - t_recon).max())
        print(f"parity vs torch reference (identical random weights): latent abs={lat_err:.2e} recon abs={rec_err:.2e}")
        assert lat_err < 5e-4 and rec_err < 5e-4, (lat_err, rec_err)
    else:
        print("no checkpoints and no torch reference: shape/finiteness gates only")

    out = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)), "example_decoded.png")
    try:
        from PIL import Image

        both = np.concatenate([img[0], recon[0]], axis=2)  # side by side
        both = np.clip((np.transpose(both, (1, 2, 0)) + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(both).save(out)
        print(f"wrote {out}")
    except ImportError:
        print("PIL unavailable; skipping visualization")


if __name__ == "__main__":
    main()
