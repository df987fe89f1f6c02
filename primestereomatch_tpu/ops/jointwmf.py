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
    out = jnp.argmax(crossed, axis=0)
    return out.astype(jnp.uint8 if hist.shape[0] <= 256 else jnp.int32)


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


# --- float-input path: adaptive quantization ------------------------------
# Reference: include/JointWMF.h:670-775 (from32FTo32S / from32STo32F) — a
# CV_32F input is adaptively quantized to <= nI integer levels before
# filterCore and mapped back through the per-level median values after.
# Like the reference, this is host-side per-frame preprocessing (it sorts
# the whole image); the filter itself stays on device.


def from32f_to_32s(
    img: np.ndarray, n_levels: int = 256
) -> tuple[np.ndarray, np.ndarray, int]:
    """Adaptive quantization of a float32 image to integer level indexes.

    Reproduces the reference contract (include/JointWMF.h:670-745): binary
    search (threshold 1e-5, float32 arithmetic) for the smallest error
    bound m such that greedily clustering the sorted pixel values — a new
    cluster whenever a value exceeds (cluster base + m) — needs at most
    `n_levels` clusters; each pixel maps to its cluster index and each
    cluster to the median of its values.

    Formulated as a searchsorted boundary chain over the sorted values
    (each cluster boundary found in O(log N)) instead of the reference's
    linear walk, so a count/assign pass is O(n_levels log N), not O(N).

    Returns (index image int32, mapping float32 (n_levels,), n_used).
    mapping[k] for k >= n_used is padding (repeats the last used value).
    """
    flat = np.ascontiguousarray(img, dtype=np.float32).ravel()
    n = flat.size
    order = np.argsort(flat, kind="stable")
    v = flat[order]
    max_range = np.float32(v[-1] - v[0])
    th = np.float32(1e-5)

    def boundaries(m: np.float32, cap: int) -> list[int] | None:
        """Start indices of clusters 1..K-1 under bound m; None if > cap
        clusters would be needed (the reference's suc=false)."""
        starts: list[int] = []
        i = int(np.searchsorted(v, np.float32(v[0] + m), side="right"))
        while i < n:
            if len(starts) + 1 == cap:
                return None
            starts.append(i)
            i = int(np.searchsorted(v, np.float32(v[i] + m), side="right"))
        return starts

    lo = np.float32(0)
    hi = np.float32(max_range * np.float32(2.0) / np.float32(n_levels))
    while hi - lo > th:
        m = np.float32((hi + lo) * np.float32(0.5))
        if boundaries(m, n_levels) is not None:
            hi = m
        else:
            lo = m

    starts = boundaries(hi, n_levels + 1)
    assert starts is not None
    edges = np.asarray([0, *starts, n], dtype=np.int64)
    n_used = len(edges) - 1
    # per-cluster median value: sorted element at (start + next_start - 1) >> 1
    mapping = np.empty(n_levels, np.float32)
    mapping[:n_used] = v[(edges[:-1] + edges[1:] - 1) >> 1]
    mapping[n_used:] = mapping[n_used - 1]
    # cluster id of sorted position j = #boundaries <= j
    ids_sorted = np.searchsorted(edges[1:-1], np.arange(n), side="right")
    idx = np.empty(n, np.int32)
    idx[order] = ids_sorted
    return idx.reshape(img.shape), mapping, n_used


def from32s_to_32f(idx: np.ndarray, mapping: np.ndarray) -> np.ndarray:
    """Map quantization indexes back to float32 values
    (include/JointWMF.h:751-775)."""
    return mapping.astype(np.float32)[idx]


def joint_wmf_float(
    disp_f32,                          # (H, W) float32 disparities (host/np)
    guide_u8: jax.Array | None = None,
    *,
    radius: int = 9,
    n_levels: int = 256,
    sigma: float = 25.5,
    findex: jax.Array | None = None,
    wmap: jax.Array | None = None,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Weighted median of a FLOAT disparity/depth map (reference CV_32F
    input branch, include/JointWMF.h:94-143): adaptively quantize to
    <= n_levels indexes, filter the index image on device, map the median
    indexes back to float values. Returns (H, W) float32.

    The quantization is data-dependent (it sorts the image), so this
    entry point is eager — call it outside jit, like the reference calls
    from32FTo32S on the host before its filter loop.
    """
    if isinstance(disp_f32, jax.core.Tracer):
        raise TypeError(
            "joint_wmf_float quantizes on the host (data-dependent level "
            "boundaries) and cannot be traced under jit; call it eagerly"
        )
    idx, mapping, _ = from32f_to_32s(np.asarray(disp_f32), n_levels)
    med = joint_wmf(
        jnp.asarray(idx), guide_u8, radius=radius, n_bins=n_levels,
        sigma=sigma, findex=findex, wmap=wmap, valid=valid,
    )
    return jnp.asarray(mapping)[med.astype(jnp.int32)]
