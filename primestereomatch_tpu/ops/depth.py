"""Disparity -> depth / 3D reprojection via the rectification Q matrix.

The reference carries Q through StereoCameraProperties
(include/StereoCalib.h:50-57, produced by stereoRectify at
src/StereoMatch.cpp:456-458) — the depth-estimation endpoint of the whole
pipeline. cv::reprojectImageTo3D semantics:

  [X Y Z W]^T = Q @ [x y disp 1]^T ;  point = (X/W, Y/W, Z/W)

TPU-first: a fused elementwise map over the disparity image (Q is tiny and
constant-folded; no matmul needed — Q's structure is exploited directly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def reproject_disparity(
    disp: jax.Array,            # (H, W) float32 disparities (pixels)
    Q: np.ndarray,              # (4, 4) from stereo_rectify
    invalid_value: float = 0.0,
    max_depth: float = jnp.inf,
) -> jax.Array:
    """(H, W, 3) XYZ in calibration units; invalid/infinite disparities map
    to zeros (disp <= 0 or W-term <= 0)."""
    H, W = disp.shape
    Q = np.asarray(Q, np.float64)
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    d = disp.astype(jnp.float32)

    X = Q[0, 0] * x + Q[0, 1] * y + Q[0, 2] * d + Q[0, 3]
    Y = Q[1, 0] * x + Q[1, 1] * y + Q[1, 2] * d + Q[1, 3]
    Z = Q[2, 0] * x + Q[2, 1] * y + Q[2, 2] * d + Q[2, 3]
    Wt = Q[3, 0] * x + Q[3, 1] * y + Q[3, 2] * d + Q[3, 3]

    valid = (d > 0) & (jnp.abs(Wt) > 1e-12)
    inv_w = jnp.where(valid, 1.0 / Wt, 0.0)
    pts = jnp.stack([X * inv_w, Y * inv_w, Z * inv_w], axis=-1)
    depth_ok = valid & (jnp.abs(pts[..., 2]) < max_depth)
    return jnp.where(depth_ok[..., None], pts, invalid_value)


def disparity_to_depth(
    disp: jax.Array, Q: np.ndarray, invalid_value: float = 0.0
) -> jax.Array:
    """(H, W) metric depth Z = fx * baseline / disparity, via Q's terms
    (Z/W with Q[2,3] = f, Q[3,2] = -1/Tx)."""
    Q = np.asarray(Q, np.float64)
    d = disp.astype(jnp.float32)
    w = Q[3, 2] * d + Q[3, 3]
    valid = (d > 0) & (jnp.abs(w) > 1e-12)
    return jnp.where(valid, jnp.float32(Q[2, 3]) / jnp.where(valid, w, 1.0),
                     invalid_value)
