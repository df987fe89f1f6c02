"""Normalized box (mean) filter with OpenCV `cv::blur` semantics.

The reference aggregates guided-filter statistics with `cv::blur(I, ksize=(r,r))`
(src/fastguidedfilter.cpp:5-10, src/CVF.cpp boxFilter calls), i.e. a k x k
mean with the anchor at the window center and BORDER_REFLECT_101 padding.

TPU-first design notes:
  * Separable two-pass windowed sum over statically padded arrays. Shapes are
    static under jit, so padding is free to express and XLA fuses the
    elementwise divide into neighbours.
  * Two interchangeable inner engines:
      - 'scan'  : running-sum (integral image) via cumsum -> O(1)/output.
                  This is the same dataflow as the reference OpenCL
                  BoxRows/BoxCols running-sum kernels (assets/cvf.cl:606-683).
      - 'window': lax.reduce_window -> O(k)/output, exact k-term sums
                  (bit-closer to OpenCV for large images).
    The fused Pallas kernel (kernels/) supersedes both on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reflect101_pad(x: jax.Array, lo: int, hi: int, axes: tuple[int, int]) -> jax.Array:
    pad = [(0, 0)] * x.ndim
    for a in axes:
        pad[a] = (lo, hi)
    # numpy/jax 'reflect' == OpenCV BORDER_REFLECT_101 (gfedcb|abcdefgh|gfedcba)
    return jnp.pad(x, pad, mode="reflect")


def window_sum_1d(x: jax.Array, k: int, axis: int, engine: str = "window") -> jax.Array:
    """Sum over a length-k sliding window along `axis` (valid mode):
    output length = x.shape[axis] - k + 1."""
    if k == 1:
        return x
    if engine == "scan":
        # window sum w[i] = c[i+k-1] - c[i-1]; realize c[-1] = 0 by shifting.
        c = jnp.cumsum(x, axis=axis)
        hi = jax.lax.slice_in_dim(c, k - 1, c.shape[axis], axis=axis)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
        lo_shift = jnp.concatenate(
            [zero, jax.lax.slice_in_dim(c, 0, c.shape[axis] - k, axis=axis)], axis=axis
        )
        return hi - lo_shift
    # exact k-term summation
    ndim = x.ndim
    win = [1] * ndim
    win[axis] = k
    return jax.lax.reduce_window(
        x, 0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        jax.lax.add, tuple(win), (1,) * ndim, "VALID",
    )


def box_sum(x: jax.Array, k: int, engine: str = "window") -> jax.Array:
    """k x k windowed sum over the last two axes, reflect-101 borders,
    output shape == input shape.

    The window anchor follows OpenCV's default (k//2, k//2): for even k the
    window spans [i - k//2, i + k - 1 - k//2] (e.g. k=8 -> [i-4, i+3]),
    matching cv::boxFilter/cv::blur with anchor (-1,-1).
    """
    lo = k // 2
    hi = k - 1 - lo
    p = _reflect101_pad(x, lo, hi, (x.ndim - 2, x.ndim - 1))
    s = window_sum_1d(p, k, x.ndim - 2, engine)
    return window_sum_1d(s, k, x.ndim - 1, engine)


def box_mean(x: jax.Array, k: int, engine: str = "window") -> jax.Array:
    """OpenCV `cv::blur(x, (k,k))` equivalent (normalized, reflect-101).

    Reference: src/fastguidedfilter.cpp:5-10 (boxfilter = cv::blur).
    """
    return box_sum(x, k, engine) * (1.0 / (k * k))
