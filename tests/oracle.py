"""NumPy/OpenCV oracle of the reference C++ CPU-float semantics.

This module is TEST-ONLY: it re-expresses what the reference C++ does,
stage by stage, using cv2 primitives (the same library the reference calls)
so the JAX framework can be validated against it. It is not part of the
framework's compute path.

Citations refer to /root/reference (see SURVEY.md).
"""

from __future__ import annotations

import numpy as np
import cv2

ALPHA = np.float32(0.9)
BC = np.float32(1.0)


# --- CVC (src/CVC.cpp) ------------------------------------------------------

def preprocess_grad(img_f32_bgr: np.ndarray) -> np.ndarray:
    """cvtColor(CV_RGB2GRAY on BGR data) + Sobel(CV_32F,1,0,ksize=1)."""
    gray = cv2.cvtColor(img_f32_bgr, cv2.COLOR_RGB2GRAY)
    return cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=1)


def build_cost_volume_left(l_img, r_img, l_grd, r_grd, max_dis):
    H, W, _ = l_img.shape
    cv_ = np.zeros((max_dis, H, W), np.float32)
    for d in range(max_dis):
        for x in range(W):
            if x >= d:
                clr = np.sum(np.abs(l_img[:, x] - r_img[:, x - d]), axis=-1)
                grd = np.abs(l_grd[:, x] - r_grd[:, x - d])
            else:
                clr = np.sum(np.abs(l_img[:, x] - BC), axis=-1)
                grd = np.abs(l_grd[:, x] - BC)
            cv_[d, :, x] = ALPHA * clr + (1 - ALPHA) * grd
    return cv_


def build_cost_volume_right(l_img, r_img, l_grd, r_grd, max_dis):
    """Right volume: reference swaps args (DispEst.cpp:215-218) so 'l_img'
    here is the right view and the shift is +d."""
    H, W, _ = l_img.shape
    cv_ = np.zeros((max_dis, H, W), np.float32)
    for d in range(max_dis):
        for x in range(W):
            if x < W - d:
                clr = np.sum(np.abs(l_img[:, x] - r_img[:, x + d]), axis=-1)
                grd = np.abs(l_grd[:, x] - r_grd[:, x + d])
            else:
                clr = np.sum(np.abs(l_img[:, x] - BC), axis=-1)
                grd = np.abs(l_grd[:, x] - BC)
            cv_[d, :, x] = ALPHA * clr + (1 - ALPHA) * grd
    return cv_


# --- FGF (src/fastguidedfilter.cpp) ------------------------------------------

def _box(I, r):
    return cv2.blur(I, (r, r))


class FGFColorOracle:
    def __init__(self, I_f32_bgr, r=8, eps=1e-4, s=4):
        self.s = s
        self.r = 2 * (r // s) + 1
        self.eps = eps
        self.orig = [I_f32_bgr[..., c].copy() for c in range(3)]
        H, W, _ = I_f32_bgr.shape
        I_low = cv2.resize(I_f32_bgr, (W // s, H // s), interpolation=cv2.INTER_NEAREST)
        self.ch = [I_low[..., c].copy() for c in range(3)]
        r_ = self.r
        m = [_box(c, r_) for c in self.ch]
        self.means = m
        eps = np.float32(eps)
        v_rr = _box(self.ch[0] * self.ch[0], r_) - m[0] * m[0] + eps
        v_rg = _box(self.ch[0] * self.ch[1], r_) - m[0] * m[1]
        v_rb = _box(self.ch[0] * self.ch[2], r_) - m[0] * m[2]
        v_gg = _box(self.ch[1] * self.ch[1], r_) - m[1] * m[1] + eps
        v_gb = _box(self.ch[1] * self.ch[2], r_) - m[1] * m[2]
        v_bb = _box(self.ch[2] * self.ch[2], r_) - m[2] * m[2] + eps
        inv_rr = v_gg * v_bb - v_gb * v_gb
        inv_rg = v_gb * v_rb - v_rg * v_bb
        inv_rb = v_rg * v_gb - v_gg * v_rb
        inv_gg = v_rr * v_bb - v_rb * v_rb
        inv_gb = v_rb * v_rg - v_rr * v_gb
        inv_bb = v_rr * v_gg - v_rg * v_rg
        det = inv_rr * v_rr + inv_rg * v_rg + inv_rb * v_rb
        self.inv = [t / det for t in (inv_rr, inv_rg, inv_rb, inv_gg, inv_gb, inv_bb)]

    def filter(self, p):
        H, W = self.orig[0].shape
        h, w = self.ch[0].shape
        r_ = self.r
        p_low = cv2.resize(p, (w, h), interpolation=cv2.INTER_NEAREST)
        mean_p = _box(p_low, r_)
        cov = []
        for c in range(3):
            cov.append(_box(self.ch[c] * p_low, r_) - self.means[c] * mean_p)
        inv_rr, inv_rg, inv_rb, inv_gg, inv_gb, inv_bb = self.inv
        a_r = inv_rr * cov[0] + inv_rg * cov[1] + inv_rb * cov[2]
        a_g = inv_rg * cov[0] + inv_gg * cov[1] + inv_gb * cov[2]
        a_b = inv_rb * cov[0] + inv_gb * cov[1] + inv_bb * cov[2]
        b = mean_p - a_r * self.means[0] - a_g * self.means[1] - a_b * self.means[2]
        up = lambda t: cv2.resize(_box(t, r_), (W, H), interpolation=cv2.INTER_LINEAR)
        return (up(a_r) * self.orig[0] + up(a_g) * self.orig[1]
                + up(a_b) * self.orig[2] + up(b))


# --- WTA (src/DispSel.cpp:83-109) --------------------------------------------

def wta(cost_volume):
    return (np.argmin(cost_volume[1:], axis=0) + 1).astype(np.uint8)


# --- JointWMF (include/JointWMF.h) -------------------------------------------

def feature_indexing_3ch(F_u8_bgr, nF=256, sigma=25.5, seed: int | None = 0):
    """featureIndexing for a 3-channel uchar guide (JointWMF.h:543-656):
    6-bit quantization -> unique colors -> k-means(nF, kmeans++) -> index map
    + exp weight table over cluster centers."""
    H, W, _ = F_u8_bgr.shape
    q = (F_u8_bgr >> 2).astype(np.int32)             # 6-bit B,G,R
    flat = q.reshape(-1, 3)
    # unique in (B,G,R) traversal order matching the hash-table scan
    codes = flat[:, 0] * 64 * 64 + flat[:, 1] * 64 + flat[:, 2]
    uniq = np.unique(codes)
    samples = np.stack([uniq // 4096, (uniq // 64) % 64, uniq % 64], axis=1)
    samples = samples.astype(np.float32)
    nF = min(nF, len(samples))
    if seed is not None:
        cv2.setRNGSeed(seed)
    crit = (cv2.TERM_CRITERIA_MAX_ITER | cv2.TERM_CRITERIA_EPS, 0, 10000)
    _, labels, centers = cv2.kmeans(
        samples, nF, None, crit, 1, cv2.KMEANS_PP_CENTERS
    )
    labels = labels.ravel()
    lut = dict(zip(uniq.tolist(), labels.tolist()))
    findex = np.array([lut[c] for c in codes], np.int32).reshape(H, W)
    sig = np.float32(sigma / 256.0 * 64)
    divider = np.float32(1.0 / (2 * sig * sig))
    diff = centers[:, None, :] - centers[None, :, :]
    wmap = np.exp(-np.sum(diff * diff, axis=-1) * divider).astype(np.float32)
    return findex, wmap


def joint_wmf_oracle(disp_u8, findex, wmap, r, n_bins=256):
    """Direct (slow) evaluation of the filterCore contract: smallest v with
    cumulative weight >= total/2 over the clamped window."""
    H, W = disp_u8.shape
    out = np.zeros_like(disp_u8)
    d = disp_u8.astype(np.int32)
    for y in range(H):
        y0, y1 = max(0, y - r), min(H - 1, y + r)
        for x in range(W):
            x0, x1 = max(0, x - r), min(W - 1, x + r)
            fq = findex[y0:y1 + 1, x0:x1 + 1].ravel()
            dq = d[y0:y1 + 1, x0:x1 + 1].ravel()
            w = wmap[findex[y, x], fq]
            hist = np.bincount(dq, weights=w, minlength=n_bins)
            cum = np.cumsum(hist)
            half = cum[-1] / 2.0
            out[y, x] = int(np.argmax(cum >= half))
    return out


def joint_wmf_exact_oracle(disp_u8, guide_u8_bgr, r, sigma=25.5, n_bins=64):
    """'exact' mode oracle: pairwise weights from 6-bit colors directly."""
    H, W = disp_u8.shape
    q = (guide_u8_bgr >> 2).astype(np.float32)
    sig = sigma / 256.0 * 64
    inv2 = 1.0 / (2 * sig * sig)
    d = disp_u8.astype(np.int32)
    out = np.zeros_like(disp_u8)
    for y in range(H):
        y0, y1 = max(0, y - r), min(H - 1, y + r)
        for x in range(W):
            x0, x1 = max(0, x - r), min(W - 1, x + r)
            cq = q[y0:y1 + 1, x0:x1 + 1].reshape(-1, 3)
            dq = d[y0:y1 + 1, x0:x1 + 1].ravel()
            dist2 = np.sum((q[y, x] - cq) ** 2, axis=-1)
            w = np.exp(-dist2 * inv2).astype(np.float32)
            hist = np.bincount(dq, weights=w, minlength=n_bins)
            cum = np.cumsum(hist)
            out[y, x] = int(np.argmax(cum >= cum[-1] / 2.0))
    return out


# --- PP tools (src/PP.cpp) ----------------------------------------------------

def lr_check_oracle(l_dis, r_dis):
    H, W = l_dis.shape
    lv = np.zeros((H, W), np.uint8)
    rv = np.zeros((H, W), np.uint8)
    for y in range(H):
        for x in range(W):
            ld = int(l_dis[y, x])
            rloc = (x - ld + W) % W
            if ld == int(r_dis[y, rloc]) and ld >= 2:
                lv[y, x] = 1
            rd = int(r_dis[y, x])
            lloc = (x + rd + W) % W
            if rd == int(l_dis[y, lloc]) and rd >= 2:
                rv[y, x] = 1
    return lv, rv


def fill_inv_oracle(dis, valid):
    H, W = dis.shape
    out = dis.copy()
    for y in range(H):
        for x in range(W):
            if valid[y, x]:
                continue
            lf = x
            while lf >= 0 and not valid[y, lf]:
                lf -= 1
            rf = x
            while rf < W and not valid[y, rf]:
                rf += 1
            if lf >= 0 and rf < W:
                out[y, x] = min(dis[y, lf], dis[y, rf])
            elif lf >= 0:
                out[y, x] = dis[y, lf]
            elif rf < W:
                out[y, x] = dis[y, rf]
    return out


def wgt_median_oracle(img_f32, dis, valid, max_dis, med_sz=19,
                      sig_clr=0.1, sig_dis=9.0, use_sqrt=False):
    H, W = dis.shape
    r = med_sz // 2
    out = dis.copy()
    for y in range(H):
        for x in range(W):
            if valid[y, x]:
                continue
            hist = np.zeros(max_dis, np.float32)
            for wy in range(-r, r + 1):
                qy = (y + wy + H) % H
                for wx in range(-r, r + 1):
                    qx = (x + wx + W) % W
                    qd = int(dis[qy, qx])
                    if qd == 0:
                        continue
                    dw = float(wx * wx + wy * wy)
                    cw = float(np.sum((img_f32[y, x] - img_f32[qy, qx]) ** 2))
                    if use_sqrt:
                        dw = np.sqrt(dw)
                        cw = np.sqrt(cw)
                    bi = np.exp(-dw / (sig_dis ** 2) - cw / (sig_clr ** 2))
                    hist[qd] += bi
            cum = np.cumsum(hist)
            half = cum[-1] / 2.0
            out[y, x] = int(np.argmax(cum >= half))
    return out
