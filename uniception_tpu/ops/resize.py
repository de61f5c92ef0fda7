"""
Image resize with exact torch `F.interpolate` semantics.

XLA's `jax.image.resize` only implements half-pixel (align_corners=False)
sampling; the reference relies on bilinear align_corners=True in the DPT
fusion/regression path (dpt_block.py:305-312, dpt.py:304) and bicubic
align_corners=False for positional-embedding interpolation. This module
implements both as *separable weight-matrix contractions*: a (H_out, H_in)
row-interp matmul followed by a (W_out, W_in) column-interp matmul — exact,
differentiable, and MXU-friendly (the matrices are tiny and constant-folded
under jit).
"""

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["interpolate", "interpolate_nhwc", "resize_bilinear", "resize_bicubic"]


@functools.lru_cache(maxsize=64)
def _linear_weights(n_in: int, n_out: int, align_corners: bool, scale=None) -> np.ndarray:
    "Dense (n_out, n_in) bilinear interpolation matrix (torch semantics)."
    w = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        if align_corners:
            src = 0.0 if n_out == 1 else i * (n_in - 1) / (n_out - 1)
        else:
            s = scale if scale is not None else n_out / n_in
            src = (i + 0.5) / s - 0.5
            src = min(max(src, 0.0), n_in - 1)
        i0 = int(np.floor(src))
        i0 = min(i0, n_in - 1)
        i1 = min(i0 + 1, n_in - 1)
        f = src - i0
        w[i, i0] += 1 - f
        w[i, i1] += f
    return w


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    "Keys cubic convolution kernel with torch's a=-0.75."
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    out = np.where(ax <= 1, (a + 2) * ax3 - (a + 3) * ax2 + 1, 0.0)
    out = np.where((ax > 1) & (ax < 2), a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, out)
    return out


@functools.lru_cache(maxsize=64)
def _cubic_weights(n_in: int, n_out: int, align_corners: bool, scale=None) -> np.ndarray:
    "Dense (n_out, n_in) bicubic interpolation matrix (torch semantics)."
    w = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        if align_corners:
            src = 0.0 if n_out == 1 else i * (n_in - 1) / (n_out - 1)
        else:
            s = scale if scale is not None else n_out / n_in
            src = (i + 0.5) / s - 0.5
        i0 = int(np.floor(src))
        f = src - i0
        idx = np.array([i0 - 1, i0, i0 + 1, i0 + 2])
        weights = _cubic_kernel(np.array([f + 1, f, f - 1, f - 2]))
        # torch border handling: clamp indices (replicate edge)
        idx = np.clip(idx, 0, n_in - 1)
        for j, ww in zip(idx, weights):
            w[i, j] += ww
    return w


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    "x: (..., H, W) -> (..., H_out, W_out) via two contractions."
    dt = x.dtype
    wh_j = jnp.asarray(wh, dt)
    ww_j = jnp.asarray(ww, dt)
    x = jnp.einsum("oh,...hw->...ow", wh_j, x)
    x = jnp.einsum("pw,...ow->...op", ww_j, x)
    return x


def _resolve_plan(H, W, size, scale_factor, mode, align_corners):
    """Shared size/scale/mode resolution for both layout variants.

    Returns (kind, payload): ("identity", None), ("weights", (wh, ww)) for
    the separable-matrix modes, or ("nearest", (hi, wi)) index arrays.
    """
    scales = (None, None)
    if size is None:
        assert scale_factor is not None
        sf = scale_factor if isinstance(scale_factor, (tuple, list)) else (scale_factor, scale_factor)
        size = (int(H * sf[0]), int(W * sf[1]))
        if not align_corners:
            scales = (float(sf[0]), float(sf[1]))
    Ho, Wo = int(size[0]), int(size[1])
    if (Ho, Wo) == (H, W) and scales == (None, None):
        return "identity", None
    if mode == "bilinear":
        return "weights", (_linear_weights(H, Ho, align_corners, scales[0]), _linear_weights(W, Wo, align_corners, scales[1]))
    if mode == "bicubic":
        return "weights", (_cubic_weights(H, Ho, align_corners, scales[0]), _cubic_weights(W, Wo, align_corners, scales[1]))
    if mode == "nearest":
        hi = np.clip((np.arange(Ho) * H) // Ho, 0, H - 1)
        wi = np.clip((np.arange(Wo) * W) // Wo, 0, W - 1)
        return "nearest", (hi, wi)
    raise ValueError(f"Unknown interpolation mode: {mode}")


def interpolate(x: jnp.ndarray, size=None, scale_factor=None, mode: str = "bilinear", align_corners: bool = False):
    """torch.nn.functional.interpolate equivalent over (..., H, W) arrays.

    Supports mode in {"bilinear", "bicubic", "nearest"}. When scale_factor
    is given, source coordinates use the *explicit* scale (torch semantics:
    src = (i + 0.5) / scale - 0.5), which matters for DINO's historical
    interpolate_offset=0.1 kludge.
    """
    kind, payload = _resolve_plan(x.shape[-2], x.shape[-1], size, scale_factor, mode, align_corners)
    if kind == "identity":
        return x
    if kind == "nearest":
        hi, wi = payload
        return x[..., hi, :][..., wi]
    return _apply_separable(x, *payload)


def interpolate_nhwc(x: jnp.ndarray, size=None, scale_factor=None, mode: str = "bilinear", align_corners: bool = False):
    """`interpolate` over (B, H, W, C) without layout round-trips.

    Contracts the H and W axes in place (einsums at positions 1, 2). Same
    weight matrices as `interpolate` — numerically identical (measured
    bit-exact vs the BCHW round-trip). Perf note (TPU v5e, 256->512 @128ch):
    the BCHW round-trip is *faster* (0.38 vs 0.58 ms) — XLA fuses the
    transposes into the contraction and prefers that layout; use this
    variant for clarity in NHWC code, not for speed.
    """
    kind, payload = _resolve_plan(x.shape[1], x.shape[2], size, scale_factor, mode, align_corners)
    if kind == "identity":
        return x
    if kind == "nearest":
        hi, wi = payload
        return x[:, hi][:, :, wi]
    wh, ww = payload
    dt = x.dtype
    x = jnp.einsum("oh,bhwc->bowc", jnp.asarray(wh, dt), x)
    x = jnp.einsum("pw,bowc->bopc", jnp.asarray(ww, dt), x)
    return x


def resize_bilinear(x, size, align_corners=False):
    return interpolate(x, size=size, mode="bilinear", align_corners=align_corners)


def resize_bicubic(x, size, align_corners=False):
    return interpolate(x, size=size, mode="bicubic", align_corners=align_corners)
