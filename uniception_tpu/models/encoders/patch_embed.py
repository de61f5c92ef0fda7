"""
Patch embeddings for CroCo / DUSt3R style encoders.

Behavioral parity with reference uniception/models/libs/croco/patch_embed.py:
    * PatchEmbedCroCo   — fixed image size assert (patch_embed.py:34-61)
    * PatchEmbedDust3R  — any size divisible by patch (patch_embed.py:68-82)
    * ManyAR_PatchEmbed — mixed landscape/portrait batches via true_shape
      (patch_embed.py:85-127)

TPU-native redesign of ManyAR: the reference scatters into a zero tensor
with boolean masks (data-dependent, XLA-hostile). Here both orientations
are patchified (the conv runs twice on static shapes — negligible vs the
ViT trunk) and merged with a vectorized `jnp.where` on the per-sample
is_landscape predicate, keeping the whole path jit-compatible with static
shapes.

Conv runs in NHWC internally (TPU-native); the (B, N, C) token order is
identical to the reference's BCHW flatten.
"""

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from uniception_tpu.models.utils.positional_encoding import make_patch_positions
from uniception_tpu.nn.common import Identity, xavier_uniform

__all__ = ["PatchEmbedCroCo", "PatchEmbedDust3R", "ManyAR_PatchEmbed", "get_patch_embed"]


def _to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class PatchEmbedCroCo(nnx.Module):
    "Conv patchifier with strict input-size check (CroCo semantics)."

    def __init__(
        self,
        img_size: Union[int, Tuple[int, int]] = 224,
        patch_size: Union[int, Tuple[int, int]] = 16,
        in_chans: int = 3,
        embed_dim: int = 768,
        norm_layer=None,
        flatten: bool = True,
        *,
        dtype=None,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        img_size = _to_2tuple(img_size)
        patch_size = _to_2tuple(patch_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.grid_size = (img_size[0] // patch_size[0], img_size[1] // patch_size[1])
        self.num_patches = self.grid_size[0] * self.grid_size[1]
        self.flatten = flatten
        self.embed_dim = embed_dim

        # xavier-uniform over the flattened (out, in*kh*kw) view, matching
        # PatchEmbedCroCo._init_weights (patch_embed.py:63-65)
        def conv_init(key, shape, dtype_):
            kh, kw, cin, cout = shape
            w = xavier_uniform(key, (kh * kw * cin, cout), dtype_)
            return w.reshape(kh, kw, cin, cout)

        self.proj = nnx.Conv(
            in_chans,
            embed_dim,
            kernel_size=patch_size,
            strides=patch_size,
            padding="VALID",
            kernel_init=conv_init,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.norm = norm_layer(embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs) if norm_layer else Identity()

    def _project(self, image_bchw: jnp.ndarray) -> jnp.ndarray:
        "BCHW image -> (B, H', W', C) patch features (NHWC conv)."
        x = jnp.transpose(image_bchw, (0, 2, 3, 1))
        return self.proj(x)

    def _check(self, H, W):
        assert H == self.img_size[0], f"Input image height ({H}) doesn't match model ({self.img_size[0]})."
        assert W == self.img_size[1], f"Input image width ({W}) doesn't match model ({self.img_size[1]})."

    def __call__(self, image: jnp.ndarray, true_shape: Optional[jnp.ndarray] = None):
        B, C, H, W = image.shape
        self._check(H, W)
        x = self._project(image)  # (B, H', W', C)
        hp, wp = x.shape[1], x.shape[2]
        pos = make_patch_positions(B, hp, wp)
        if self.flatten:
            x = x.reshape(B, hp * wp, self.embed_dim)
        x = self.norm(x)
        return x, pos


class PatchEmbedDust3R(PatchEmbedCroCo):
    "Patchifier accepting any size divisible by the patch size."

    def _check(self, H, W):
        assert H % self.patch_size[0] == 0, f"Input image height ({H}) is not a multiple of patch size ({self.patch_size[0]})."
        assert W % self.patch_size[1] == 0, f"Input image width ({W}) is not a multiple of patch size ({self.patch_size[1]})."


class ManyAR_PatchEmbed(PatchEmbedCroCo):
    """Mixed landscape/portrait batches.

    Inputs arrive in landscape frame (W >= H); ``true_shape`` (B, 2) gives
    each sample's actual (height, width). Portrait samples are patchified
    from the transposed image and merged with `jnp.where`.
    """

    def __call__(self, image: jnp.ndarray, true_shape: jnp.ndarray):
        B, C, H, W = image.shape
        assert W >= H, f"img should be in landscape mode, but got W={W} H={H}"
        assert H % self.patch_size[0] == 0 and W % self.patch_size[1] == 0
        assert true_shape.shape == (B, 2), f"true_shape has the wrong shape={true_shape.shape}"

        wp, hp = W // self.patch_size[1], H // self.patch_size[0]
        n_tokens = hp * wp

        height, width = true_shape[:, 0], true_shape[:, 1]
        is_landscape = (width >= height)[:, None, None]  # (B, 1, 1)

        x_land = self._project(image).reshape(B, n_tokens, self.embed_dim)
        x_port = self._project(jnp.swapaxes(image, -1, -2)).reshape(B, n_tokens, self.embed_dim)

        pos_land = make_patch_positions(B, hp, wp)
        pos_port = make_patch_positions(B, wp, hp)

        x = jnp.where(is_landscape, x_land, x_port)
        pos = jnp.where(is_landscape, pos_land, pos_port)

        x = self.norm(x)
        return x, pos


def get_patch_embed(patch_embed_cls: str, img_size, patch_size, enc_embed_dim, *, dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
    "String factory matching the reference's get_patch_embed (patch_embed.py:13-16)."
    classes = {
        "PatchEmbedCroCo": PatchEmbedCroCo,
        "PatchEmbedDust3R": PatchEmbedDust3R,
        "ManyAR_PatchEmbed": ManyAR_PatchEmbed,
    }
    assert patch_embed_cls in classes, f"Unknown patch embed class: {patch_embed_cls}"
    return classes[patch_embed_cls](img_size, patch_size, 3, enc_embed_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
