"""Color conversion and the ksize-1 horizontal Sobel gradient.

Reference CVC preprocessing (src/CVC.cpp:41-46):
  cv::cvtColor(Img, GrdX, CV_RGB2GRAY);  cv::Sobel(GrdX, GrdX, CV_32F, 1, 0, 1);

Two deliberate reference quirks reproduced here:
  * Images are loaded by cv::imread in BGR channel order, but converted with
    CV_RGB2GRAY — so the 0.299 weight lands on the Blue channel. We match
    that behavior bit-for-bit (`bgr_to_gray_refquirk`).
  * Sobel with ksize=1 is the plain central difference [-1, 0, 1] with
    BORDER_REFLECT_101, which zeroes the gradient on the first/last column.
    (The reference OpenCL host adds +0.5 to the gradient, CVC_cl.cpp:108-111;
    the CPU float path — our golden semantics — does not.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# OpenCV R2YF/G2YF/B2YF constants, applied to channels 0,1,2 as stored.
_CVT_W = (0.299, 0.587, 0.114)


def bgr_to_gray_refquirk(img: jax.Array) -> jax.Array:
    """(..., H, W, 3) float -> (..., H, W) gray with CV_RGB2GRAY weights
    applied to BGR-ordered data (the reference's channel-order quirk)."""
    return (
        img[..., 0] * _CVT_W[0]
        + img[..., 1] * _CVT_W[1]
        + img[..., 2] * _CVT_W[2]
    )


def sobel_x_k1(gray: jax.Array) -> jax.Array:
    """cv::Sobel(dx=1, dy=0, ksize=1) == [-1, 0, 1] along x, reflect-101.

    Border columns: reflect-101 maps x=-1 -> 1 and x=W -> W-2, so the
    gradient is exactly 0 on the first and last column.
    """
    left = jnp.concatenate([gray[..., :, 1:2], gray[..., :, :-1]], axis=-1)
    right = jnp.concatenate([gray[..., :, 1:], gray[..., :, -2:-1]], axis=-1)
    return right - left


def bgr_to_gray_refquirk_u8(img_u8: jax.Array) -> jax.Array:
    """uint8 gray with OpenCV's fixed-point CV_RGB2GRAY math applied to
    BGR-ordered data (the same channel-order quirk as the float path).

    OpenCV's 8-bit cvtColor uses 14-bit fixed-point coefficients with
    round-half-up: gray = (c0*4899 + c1*9617 + c2*1868 + 8192) >> 14
    (R2Y/G2Y/B2Y at CV_DESCALE precision). This is the input the
    reference's commented-out uchar OpenCL path would see
    (src/CVC_cl.cpp:125-131)."""
    x = img_u8.astype(jnp.int32)
    return (
        (x[..., 0] * 4899 + x[..., 1] * 9617 + x[..., 2] * 1868 + (1 << 13))
        >> 14
    ).astype(jnp.uint8)


def sobel_x_k1_u8(gray_u8: jax.Array) -> jax.Array:
    """cv::Sobel(..., CV_8U, 1, 0, 1) on uint8: central difference with
    reflect-101 borders, SATURATED to [0, 255] — negative gradients clamp
    to 0 (the reference uchar path's prep, src/CVC_cl.cpp:128-129)."""
    x = gray_u8.astype(jnp.int32)
    left = jnp.concatenate([x[..., :, 1:2], x[..., :, :-1]], axis=-1)
    right = jnp.concatenate([x[..., :, 1:], x[..., :, -2:-1]], axis=-1)
    return jnp.clip(right - left, 0, 255).astype(jnp.uint8)
