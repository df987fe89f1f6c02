"""Bilinear remap — the per-frame hot half of rectification.

cv::remap(INTER_LINEAR, BORDER_CONSTANT 0) equivalent
(reference call site src/StereoMatch.cpp:472-473 and the per-frame video
preamble :130-153): sample the source image at fractional map coordinates;
out-of-image samples contribute 0.

TPU-first: the map is a static constant per camera geometry, so the gather
indices/weights fold into the compiled program; the 4-tap blend is fused
elementwise math. Works on any (..., H, W, C) or (H, W) image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def remap_bilinear(img: jax.Array, map_xy: jax.Array) -> jax.Array:
    """img: (H, W[, C]); map_xy: (Ho, Wo, 2) float32 source coords (x, y).
    Returns (Ho, Wo[, C]) with the input dtype (rounded for integers)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    mx = map_xy[..., 0]
    my = map_xy[..., 1]

    x0 = jnp.floor(mx)
    y0 = jnp.floor(my)
    fx = (mx - x0)[..., None]
    fy = (my - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        v = img[yc, xc]          # advanced-index gather: (Ho, Wo, C)
        return jnp.where(inside[..., None], v.astype(jnp.float32), 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out = top * (1.0 - fy) + bot * fy

    if jnp.issubdtype(img.dtype, jnp.integer):
        info = jnp.iinfo(img.dtype)
        out = jnp.clip(jnp.rint(out), info.min, info.max)
    out = out.astype(img.dtype)
    return out[..., 0] if squeeze else out
