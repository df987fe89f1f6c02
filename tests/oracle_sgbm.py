"""Loop-based NumPy oracle for the SGBM path — the executable specification
the JAX ops (primestereomatch_tpu/ops/sgbm.py) must match bit-for-bit.

Semantics follow Hirschmuller PAMI'08 + Birchfield-Tomasi with the
reference's parameter set (src/StereoMatch.cpp:639-660), matched to
cv::StereoSGBM's observable behavior (the reference's actual component,
src/StereoMatch.cpp:180): [1,2,1]-smoothed clipped Sobel-x prefilter
(`sobel_xclip`), integer truncating sub-pixel refinement, scatter-based
pseudo right disparity with the floor/ceil dual LR check, and minX
left-band invalidation — validated end-to-end against raw cv2 outputs in
tests/test_sgbm_cv2_golden.py. Remaining documented delta from OpenCV:
replicate-border window sums (ours) vs OpenCV's row-buffer border math."""

from __future__ import annotations

import numpy as np

DISP_SCALE = 16


def clipped_xderiv(img_u8: np.ndarray, cap: int) -> np.ndarray:
    x = img_u8.astype(np.int64)
    H, W, C = x.shape
    out = np.zeros_like(x)
    for xx in range(W):
        left = x[:, max(xx - 1, 0)]
        right = x[:, min(xx + 1, W - 1)]
        out[:, xx] = np.clip(right - left, -cap, cap) + cap
    return out


def sobel_xclip(img_u8: np.ndarray, cap: int) -> np.ndarray:
    """cv::StereoSGBM prefilter: x-Sobel with [1,2,1] vertical smoothing
    (2*(I[y][x+1]-I[y][x-1]) + the same diff on rows y-1 and y+1, borders
    replicated), clipped to [-cap, cap], shifted to [0, 2*cap]."""
    x = img_u8.astype(np.int64)
    H, W, C = x.shape
    out = np.zeros_like(x)
    for yy in range(H):
        yu = max(yy - 1, 0)
        yd = min(yy + 1, H - 1)
        for xx in range(W):
            xl = max(xx - 1, 0)
            xr = min(xx + 1, W - 1)
            sob = (
                2 * (x[yy, xr] - x[yy, xl])
                + (x[yu, xr] - x[yu, xl])
                + (x[yd, xr] - x[yd, xl])
            )
            out[yy, xx] = np.clip(sob, -cap, cap) + cap
    return out


def _minmax_interp(f: np.ndarray):
    H, W, C = f.shape
    lo = np.zeros_like(f)
    hi = np.zeros_like(f)
    for xx in range(W):
        prev = f[:, max(xx - 1, 0)]
        nxt = f[:, min(xx + 1, W - 1)]
        lo[:, xx] = (f[:, xx] + prev) // 2
        hi[:, xx] = (f[:, xx] + nxt) // 2
    fmin = np.minimum(np.minimum(lo, hi), f)
    fmax = np.maximum(np.maximum(lo, hi), f)
    return fmin, fmax


def bt_cost(l_ftr: np.ndarray, r_ftr: np.ndarray, max_dis: int) -> np.ndarray:
    H, W, C = l_ftr.shape
    l_min, l_max = _minmax_interp(l_ftr)
    r_min, r_max = _minmax_interp(r_ftr)
    cost = np.zeros((H, W, max_dis), np.int64)
    for d in range(max_dis):
        for xx in range(W):
            xr = max(xx - d, 0)
            c1 = np.maximum(
                np.maximum(l_ftr[:, xx] - r_max[:, xr], r_min[:, xr] - l_ftr[:, xx]),
                0,
            )
            c2 = np.maximum(
                np.maximum(r_ftr[:, xr] - l_max[:, xx], l_min[:, xx] - r_ftr[:, xr]),
                0,
            )
            cost[:, xx, d] = np.minimum(c1, c2).sum(axis=-1)
    return cost


def block_cost(pix: np.ndarray, k: int) -> np.ndarray:
    H, W, D = pix.shape
    lo = k // 2
    hi = k - 1 - lo
    out = np.zeros_like(pix)
    for y in range(H):
        for x in range(W):
            acc = np.zeros(D, np.int64)
            for dy in range(-lo, hi + 1):
                for dx in range(-lo, hi + 1):
                    yy = min(max(y + dy, 0), H - 1)
                    xx = min(max(x + dx, 0), W - 1)
                    acc += pix[yy, xx]
            out[y, x] = acc
    return out


def _dp_dir(C: np.ndarray, p1: int, p2: int, dy: int, dx: int) -> np.ndarray:
    """Aggregate along direction (dy, dx): predecessor of (y, x) is
    (y - dy, x - dx); no predecessor -> L = C."""
    H, W, D = C.shape
    L = np.zeros_like(C)
    ys = range(H) if dy >= 0 else range(H - 1, -1, -1)
    xs = range(W) if dx >= 0 else range(W - 1, -1, -1)
    for y in ys:
        for x in xs:
            py, px = y - dy, x - dx
            if 0 <= py < H and 0 <= px < W and (dy or dx):
                Lp = L[py, px]
                m = Lp.min()
                for d in range(D):
                    cands = [Lp[d], m + p2]
                    if d > 0:
                        cands.append(Lp[d - 1] + p1)
                    if d < D - 1:
                        cands.append(Lp[d + 1] + p1)
                    L[y, x, d] = C[y, x, d] + min(cands) - m
            else:
                L[y, x] = C[y, x]
    return L


def aggregate(C: np.ndarray, p1: int, p2: int, num_directions: int = 8) -> np.ndarray:
    dirs8 = [(0, 1), (0, -1), (1, 0), (1, 1), (1, -1), (-1, 0), (-1, -1), (-1, 1)]
    dirs = dirs8[:num_directions]  # 8=MODE_HH, 5=MODE_SGBM causal, 3=3WAY
    S = np.zeros_like(C)
    for dy, dx in dirs:
        S += _dp_dir(C, p1, p2, dy, dx)
    return S


def select_disparity(
    S: np.ndarray, uniqueness_ratio: int, disp12_max_diff: int, min_disparity: int = 0
) -> np.ndarray:
    """cv::StereoSGBM selection semantics (computeDisparitySGBM):

      * first-min WTA + uniqueness (any far d with S[d]*(100-u) < minS*100);
      * integer truncating sub-pixel: frac = trunc(((S[d-1]-S[d+1])*16 +
        denom2) / (2*denom2)), denom2 = max(curvature, 1);
      * pseudo right disparity by SCATTER: each unique left pixel x offers
        (minS, d) to right pixel x - (d + minD); lowest cost wins, ties to
        the earliest x (= lowest d); unscattered right pixels stay invalid;
      * LR dual check: a valid pixel is invalidated only if BOTH the
        floor- and ceil-rounded disparities look up a VALID disp2 entry
        that is inconsistent (> disp12_max_diff);
      * the left band x < minX1 = max(minD + D, 0) (and x >= maxX1 =
        W + min(minD, 0)) is invalid outright.
    """
    H, W, D = S.shape
    inv = (min_disparity - 1) * DISP_SCALE
    minD = min_disparity
    minX1 = max(minD + D, 0)
    maxX1 = W + min(minD, 0)
    out = np.full((H, W), inv, np.int64)
    disp2 = np.full((H, W), minD - 1, np.int64)
    d2cost = np.full((H, W), 1 << 40, np.int64)

    for y in range(H):
        for x in range(minX1, maxX1):
            s = S[y, x]
            d = int(np.argmin(s))
            sb = int(s[d])
            bad = False
            for dd in range(D):
                if abs(dd - d) > 1 and s[dd] * (100 - uniqueness_ratio) < sb * 100:
                    bad = True
                    break
            if bad:
                continue
            x2 = x - (d + minD)
            if 0 <= x2 < W and d2cost[y, x2] > sb:
                d2cost[y, x2] = sb
                disp2[y, x2] = d + minD
            frac = 0
            if 0 < d < D - 1:
                denom2 = max(int(s[d - 1]) + int(s[d + 1]) - 2 * sb, 1)
                num = (int(s[d - 1]) - int(s[d + 1])) * DISP_SCALE + denom2
                frac = int(num / (2 * denom2))   # C truncating division
            out[y, x] = (d + minD) * DISP_SCALE + frac

        for x in range(minX1, maxX1):
            d1 = out[y, x]
            if d1 == inv:
                continue
            d_f = int(d1) >> 4                       # floor
            d_c = (int(d1) + DISP_SCALE - 1) >> 4    # ceil
            xf, xc = x - d_f, x - d_c
            if (
                0 <= xf < W and disp2[y, xf] >= minD
                and abs(disp2[y, xf] - d_f) > disp12_max_diff
                and 0 <= xc < W and disp2[y, xc] >= minD
                and abs(disp2[y, xc] - d_c) > disp12_max_diff
                and disp12_max_diff >= 0
            ):
                out[y, x] = inv
    return out.astype(np.int16)


def filter_speckles(
    disp16: np.ndarray, max_speckle_size: int, max_diff: int, invalid_value: int
) -> np.ndarray:
    """Flood-fill connected components (4-connectivity, |diff| <= max_diff
    between neighbours); area <= max_speckle_size -> invalid."""
    H, W = disp16.shape
    d = disp16.astype(np.int64)
    valid = d != invalid_value
    seen = np.zeros((H, W), bool)
    out = disp16.copy()
    for y0 in range(H):
        for x0 in range(W):
            if not valid[y0, x0] or seen[y0, x0]:
                continue
            comp = [(y0, x0)]
            seen[y0, x0] = True
            i = 0
            while i < len(comp):
                y, x = comp[i]
                i += 1
                for yy, xx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if (
                        0 <= yy < H and 0 <= xx < W and valid[yy, xx]
                        and not seen[yy, xx]
                        and abs(d[yy, xx] - d[y, x]) <= max_diff
                    ):
                        seen[yy, xx] = True
                        comp.append((yy, xx))
            if len(comp) <= max_speckle_size:
                for y, x in comp:
                    out[y, x] = invalid_value
    return out
