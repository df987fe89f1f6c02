"""Joint-histogram weighted median filter (the active post-processing stage).

Reference: include/JointWMF.h (CVPR'14 "100+ Times Faster Weighted Median
Filter", Zhang/Xu/Jia), called from PP::processDM (src/PP.cpp:402-425) with
r = MED_SZ/2 = 9, sigma = 25.5, exp weights, on the uchar disparity map with
the 8-bit color image as the feature/guide.

Semantics decoded from filterCore (include/JointWMF.h:173-408): for each
pixel p, over the window q in [p-r, p+r]^2 clamped to the image (no wrap),
with weight w(p,q) between the feature indexes of p and q, the output is the
SMALLEST value v such that  sum_{q: I(q) <= v} w(p,q) >= (total weight)/2.
All pixels participate (no validity mask on this call site; disparity 0
included).

Feature weights: for a 3-channel guide the reference quantizes colors to
6 bits/channel, k-means-clusters them into nF=256 indexes and tabulates
w[i][j] = exp(-||center_i - center_j||^2 / (2*(sigma/256*64)^2))
(include/JointWMF.h:494-660). That clustering is an approximation of the
pairwise color Gaussian; this module provides both:

  * mode 'exact'  — computes w(p,q) directly from the 6-bit quantized colors
    (no clustering error; TPU-friendly: no gathers, pure shifted FMAs).
  * mode 'table'  — takes a precomputed per-pixel feature index map and an
    (nF, nF) weight table, reproducing the reference's clustered contract
    bit-for-bit (the host-side clustering lives in utils/features.py).

TPU-first design: the joint histogram is a dense (n_bins, H, W) f32 tensor
accumulated over the (2r+1)^2 static window offsets with fused
shift-compare-FMA steps (lax.fori_loop over offsets, dynamic slices of a
padded plane), then a cumulative-sum + first-crossing argmax selects the
median. O(H*W*(win + n_bins)) with perfect vectorization — no sequential
per-column scan, no necklace tables.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def feature_weight_table(n_feat: int = 256, sigma: float = 25.5) -> np.ndarray:
    """1-channel-guide weight table: w[i,j] = exp(-(i-j)^2 / (2 sigma^2)).

    Reference: include/JointWMF.h:525-541 (op 'exp', 1-channel branch).
    """
    i = np.arange(n_feat, dtype=np.float32)
    d = i[:, None] - i[None, :]
    return np.exp(-(d * d) / (2.0 * sigma * sigma)).astype(np.float32)


def _median_from_hist(hist: jax.Array) -> jax.Array:
    """(n_bins, H, W) weights -> (H, W) smallest bin with cum >= total/2."""
    cum = jnp.cumsum(hist, axis=0)
    half = cum[-1] * 0.5
    crossed = cum >= half[None]
    return jnp.argmax(crossed, axis=0).astype(jnp.uint8)


def joint_wmf(
    disp: jax.Array,                 # (H, W) uint8 disparities
    guide_u8: jax.Array | None = None,   # (H, W, 3) uint8 color guide ('exact')
    *,
    radius: int = 9,
    n_bins: int = 64,
    sigma: float = 25.5,
    findex: jax.Array | None = None,     # (H, W) int32 feature index ('table')
    wmap: jax.Array | None = None,       # (nF, nF) float32 weight table
    valid: jax.Array | None = None,      # (H, W) float32 participation weights
) -> jax.Array:
    """Weighted median of `disp` guided by color features. Returns uint8.

    `valid` marks which pixels contribute to their neighbours' histograms
    (1.0 = participate). The reference clamps windows at the image border —
    equivalent to zero weight outside — which is the default (`valid=None`).
    The sharded tile path (parallel/sharded.py) passes an explicit mask so
    out-of-image halo rows at global edges are excluded exactly like a
    clamped window would exclude them.
    """
    H, W = disp.shape
    r = radius
    win = 2 * r + 1

    d_pad = jnp.pad(disp.astype(jnp.int32), r)
    if valid is None:
        valid = jnp.ones((H, W), jnp.float32)
    valid_pad = jnp.pad(valid.astype(jnp.float32), r)

    if findex is not None:
        assert wmap is not None, "'table' mode needs both findex and wmap"
        f_center = findex.astype(jnp.int32)
        f_pad = jnp.pad(f_center, r)
        n_feat = wmap.shape[0]
        wmap_flat = wmap.reshape(-1)
        mode = "table"
    else:
        assert guide_u8 is not None, "'exact' mode needs guide_u8"
        # 6-bit color quantization + rescaled sigma
        # (include/JointWMF.h:546,622: shift=2, nSigma = sigma/256*64).
        c6 = jnp.right_shift(guide_u8.astype(jnp.int32), 2).astype(jnp.float32)
        c6 = jnp.moveaxis(c6, -1, 0)  # (3, H, W)
        c_pad = jnp.pad(c6, ((0, 0), (r, r), (r, r)))
        sig_q = sigma / 256.0 * 64.0
        inv_two_sig2 = 1.0 / (2.0 * sig_q * sig_q)
        mode = "exact"

    bins = jnp.arange(n_bins, dtype=jnp.int32)[:, None, None]

    def body(off, hist):
        oy = off // win
        ox = off % win
        d_q = jax.lax.dynamic_slice(d_pad, (oy, ox), (H, W))
        v_q = jax.lax.dynamic_slice(valid_pad, (oy, ox), (H, W))
        if mode == "exact":
            c_q = jax.lax.dynamic_slice(c_pad, (0, oy, ox), (3, H, W))
            dist2 = jnp.sum((c6 - c_q) ** 2, axis=0)
            w = jnp.exp(-dist2 * inv_two_sig2) * v_q
        else:
            f_q = jax.lax.dynamic_slice(f_pad, (oy, ox), (H, W))
            w = jnp.take(wmap_flat, f_center * n_feat + f_q) * v_q
        return hist + w[None] * (d_q[None] == bins).astype(jnp.float32)

    hist0 = jnp.zeros((n_bins, H, W), jnp.float32)
    hist = jax.lax.fori_loop(0, win * win, body, hist0)
    return _median_from_hist(hist)
