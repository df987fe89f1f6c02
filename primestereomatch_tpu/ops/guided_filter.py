"""Guided image filtering of the cost volume (CVF stage).

Two variants matching the reference's capability surface:

  * `fast_guided_filter_color` — the ACTIVE golden path
    (src/fastguidedfilter.cpp, vendored from Sundrops/fast-guided-filter,
    arXiv 1505.00996): guide + each cost slice nearest-downsampled by s,
    radius rescaled to 2*(r/s)+1, closed-form color GIF solved at low
    resolution via a precomputed inverse covariance, (a, b) box-averaged,
    bilinearly upsampled, applied at full resolution.

  * `guided_filter_color` — full-resolution color GIF (the dead CPU CVF path
    src/CVF.cpp:72-165 and the OpenCL CVF_cl decomposition, which use a
    direct 3x3 symmetric solve per pixel with eps on the diagonal).

TPU-first design: the D cost slices share one guide, so all guide statistics
are computed once at (h, w) and broadcast; the per-slice math is pure
batched elementwise + box filters over a (D, h, w) tensor, which XLA fuses
aggressively. Everything is float32 with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from primestereomatch_tpu.ops.boxfilter import box_mean
from primestereomatch_tpu.ops.resize import resize_nearest, resize_bilinear


def _color_inverse_cov(ch, k: int, eps: float):
    """Per-pixel inverse of the 3x3 color covariance (+eps*I), adjugate/det.

    Mirrors the algebra of src/fastguidedfilter.cpp:135-166 (also
    src/CVF.cpp:120-147, assets/cvf.cl:262-327).
    Returns (means, inv) where inv = (rr, rg, rb, gg, gb, bb).
    """
    m = [box_mean(c, k) for c in ch]
    v_rr = box_mean(ch[0] * ch[0], k) - m[0] * m[0] + eps
    v_rg = box_mean(ch[0] * ch[1], k) - m[0] * m[1]
    v_rb = box_mean(ch[0] * ch[2], k) - m[0] * m[2]
    v_gg = box_mean(ch[1] * ch[1], k) - m[1] * m[1] + eps
    v_gb = box_mean(ch[1] * ch[2], k) - m[1] * m[2]
    v_bb = box_mean(ch[2] * ch[2], k) - m[2] * m[2] + eps

    inv_rr = v_gg * v_bb - v_gb * v_gb
    inv_rg = v_gb * v_rb - v_rg * v_bb
    inv_rb = v_rg * v_gb - v_gg * v_rb
    inv_gg = v_rr * v_bb - v_rb * v_rb
    inv_gb = v_rb * v_rg - v_rr * v_gb
    inv_bb = v_rr * v_gg - v_rg * v_rg

    det = inv_rr * v_rr + inv_rg * v_rg + inv_rb * v_rb
    inv = tuple(t / det for t in (inv_rr, inv_rg, inv_rb, inv_gg, inv_gb, inv_bb))
    return m, inv


def _solve_ab(p, ch_low, means, inv, k: int):
    """Low-res GIF solve for one batch of slices p (D, h, w)."""
    mean_p = box_mean(p, k)
    cov = []
    for c in range(3):
        mean_ip = box_mean(ch_low[c][None] * p, k)
        cov.append(mean_ip - means[c][None] * mean_p)
    inv_rr, inv_rg, inv_rb, inv_gg, inv_gb, inv_bb = inv
    a_r = inv_rr[None] * cov[0] + inv_rg[None] * cov[1] + inv_rb[None] * cov[2]
    a_g = inv_rg[None] * cov[0] + inv_gg[None] * cov[1] + inv_gb[None] * cov[2]
    a_b = inv_rb[None] * cov[0] + inv_gb[None] * cov[1] + inv_bb[None] * cov[2]
    b = mean_p - a_r * means[0][None] - a_g * means[1][None] - a_b * means[2][None]
    return (a_r, a_g, a_b), b


def fast_guided_filter_color(
    guide: jax.Array,          # (H, W, 3) float32 full-res guide
    p: jax.Array,              # (D, H, W) float32 cost volume
    radius: int = 8,
    eps: float = 1e-4,
    subsample: int = 4,
) -> jax.Array:
    """FastGuidedFilter(I, r, eps, s).filter(p) for every slice of p.

    Matches src/fastguidedfilter.cpp:121-198 with the reference call site's
    parameters (src/DispEst.cpp:281-295): r=GIF_R_WIN=8, eps=1e-4,
    s=subsample_rate; the effective low-res box size is 2*(r/s)+1.
    """
    H, W, _ = guide.shape
    h, w = H // subsample, W // subsample
    k = 2 * (radius // subsample) + 1

    ch_full = tuple(guide[..., c] for c in range(3))
    ch_low = tuple(resize_nearest(c, (h, w)) for c in ch_full)
    means, inv = _color_inverse_cov(ch_low, k, eps)

    p_low = resize_nearest(p, (h, w))
    (a_r, a_g, a_b), b = _solve_ab(p_low, ch_low, means, inv, k)

    mean_a = [box_mean(a, k) for a in (a_r, a_g, a_b)]
    mean_b = box_mean(b, k)

    up = lambda t: resize_bilinear(t, (H, W))
    q = (
        up(mean_a[0]) * ch_full[0][None]
        + up(mean_a[1]) * ch_full[1][None]
        + up(mean_a[2]) * ch_full[2][None]
        + up(mean_b)
    )
    return q


def guided_filter_color(
    guide: jax.Array,          # (H, W, 3)
    p: jax.Array,              # (D, H, W)
    ksize: int = 8,
    eps: float = 1e-4,
) -> jax.Array:
    """Full-resolution color GIF (reference CVF semantics, src/CVF.cpp:72-165).

    The reference uses an 8x8 box (GIF_R_WIN used directly as the kernel
    size); even sizes follow OpenCV's anchor convention (window [i-4, i+3]).
    """
    ch = tuple(guide[..., c] for c in range(3))
    means, inv = _color_inverse_cov(ch, ksize, eps)
    (a_r, a_g, a_b), b = _solve_ab(p, ch, means, inv, ksize)
    q = (
        box_mean(a_r, ksize) * ch[0][None]
        + box_mean(a_g, ksize) * ch[1][None]
        + box_mean(a_b, ksize) * ch[2][None]
        + box_mean(b, ksize)
    )
    return q
