"""Disparity post-processing tools: LR consistency, invalid fill, bilateral
weighted median.

These mirror the reference's PP toolbox (src/PP.cpp). Only JointWMF is live
on the reference's default path (processDM, src/PP.cpp:402-425), but
lrCheck / fillInv / wgtMedian define capability surface and are exposed as
first-class ops here (and are useful: enabling them improves quality).

Reference quirks preserved (documented, selectable):
  * lrCheck wraps lookups with `% wid` (src/PP.cpp:32,41) — we use the same
    modulo semantics.
  * wgtMedian wraps window coordinates with `% wid`/`% hei`
    (src/PP.cpp:165,169) -> implemented with jnp.roll (exact wraparound).
  * The reference's left-map wgtMedian uses SQUARED distances in the
    exponent while the right-map variant takes sqrt of both terms
    (src/PP.cpp:172-177 vs 218-225). `use_sqrt` selects between them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lr_check(l_disp: jax.Array, r_disp: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Left-right consistency (src/PP.cpp:17-50).

    valid_left(x)  = (lDis(x) == rDis((x - lDis(x)) mod W)) and lDis(x) >= 2
    valid_right(x) = (rDis(x) == lDis((x + rDis(x)) mod W)) and rDis(x) >= 2
    Returns uint8 0/1 maps.
    """
    H, W = l_disp.shape
    x = jnp.arange(W)[None, :]
    ld = l_disp.astype(jnp.int32)
    rd = r_disp.astype(jnp.int32)

    r_loc = jnp.mod(x - ld, W)
    r_at = jnp.take_along_axis(rd, r_loc, axis=1)
    l_valid = (ld == r_at) & (ld >= 2)

    l_loc = jnp.mod(x + rd, W)
    l_at = jnp.take_along_axis(ld, l_loc, axis=1)
    r_valid = (rd == l_at) & (rd >= 2)
    return l_valid.astype(jnp.uint8), r_valid.astype(jnp.uint8)


def fill_invalid(disp: jax.Array, valid: jax.Array) -> jax.Array:
    """Fill invalid pixels with min(nearest valid to the left, nearest valid
    to the right) along the row (src/PP.cpp:52-143).

    The reference's unbounded while-scan becomes two associative scans
    (running max of valid index forward, running min backward) — O(W) work,
    fully parallel across rows, no data-dependent loops.
    """
    H, W = disp.shape
    v = valid.astype(jnp.bool_)
    x = jnp.arange(W, dtype=jnp.int32)[None, :]

    left_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(v, x, -1), axis=1
    )
    right_idx = jax.lax.associative_scan(
        jnp.minimum, jnp.where(v, x, W), axis=1, reverse=True
    )
    l_find = left_idx >= 0
    r_find = right_idx < W

    d = disp.astype(jnp.int32)
    l_val = jnp.take_along_axis(d, jnp.clip(left_idx, 0, W - 1), axis=1)
    r_val = jnp.take_along_axis(d, jnp.clip(right_idx, 0, W - 1), axis=1)

    both = jnp.minimum(l_val, r_val)
    fill = jnp.where(
        l_find & r_find, both,
        jnp.where(l_find, l_val, jnp.where(r_find, r_val, d)),
    )
    return jnp.where(v, d, fill).astype(disp.dtype)


def weighted_median(
    img: jax.Array,        # (H, W, 3) float32 in [0,1]
    disp: jax.Array,       # (H, W) uint8
    valid: jax.Array,      # (H, W) uint8; only invalid pixels are filtered
    max_dis: int,
    med_sz: int = 19,
    sig_clr: float = 0.1,
    sig_dis: float = 9.0,
    use_sqrt: bool = False,
) -> jax.Array:
    """Bilateral-weighted median over a (med_sz x med_sz) WRAPPED window of
    pixels with nonzero disparity; replaces only invalid pixels
    (src/PP.cpp:145-247).

    biWgt = exp(-disTerm / SIG_DIS^2 - clrTerm / SIG_CLR^2) where the terms
    are squared distances (left-map variant) or their sqrt (right-map
    variant, use_sqrt=True). Output at invalid p = smallest d with
    cumulative weight >= total/2.
    """
    H, W = disp.shape
    r = med_sz // 2
    d32 = disp.astype(jnp.int32)
    chan = jnp.moveaxis(img, -1, 0)  # (3, H, W)

    inv_sig_dis2 = 1.0 / (sig_dis * sig_dis)
    inv_sig_clr2 = 1.0 / (sig_clr * sig_clr)
    bins = jnp.arange(max_dis, dtype=jnp.int32)[:, None, None]
    win = 2 * r + 1

    def body(off, hist):
        wy = off // win - r
        wx = off % win - r
        # (y+wy) % H, (x+wx) % W == roll by -wy/-wx
        d_q = jnp.roll(d32, (-wy, -wx), axis=(0, 1))
        c_q = jnp.roll(chan, (-wy, -wx), axis=(1, 2))
        dis_term = (wy * wy + wx * wx).astype(jnp.float32)
        clr_term = jnp.sum((chan - c_q) ** 2, axis=0)
        if use_sqrt:
            dis_term = jnp.sqrt(dis_term)
            clr_term = jnp.sqrt(clr_term)
        w = jnp.exp(-dis_term * inv_sig_dis2 - clr_term * inv_sig_clr2)
        w = w * (d_q != 0)
        return hist + w[None] * (d_q[None] == bins).astype(jnp.float32)

    hist = jax.lax.fori_loop(
        0, win * win, body, jnp.zeros((max_dis, H, W), jnp.float32)
    )
    cum = jnp.cumsum(hist, axis=0)
    half = cum[-1] * 0.5
    med = jnp.argmax(cum >= half[None], axis=0).astype(disp.dtype)
    return jnp.where(valid.astype(jnp.bool_), disp, med)
