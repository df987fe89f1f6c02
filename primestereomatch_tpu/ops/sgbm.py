"""Semi-global matching (STEREO_SGBM path) — TPU-native scan formulation.

The reference delegates this algorithm to cv::StereoSGBM (C++/SIMD) with the
parameter set at src/StereoMatch.cpp:639-660 (numDisp=64, SADWindow=5,
P1=8*ch*25, P2=32*ch*25, preFilterCap=63, uniqueness=10, disp12MaxDiff=1,
speckle 100/32, MODE_HH) and consumes its 16x fixed-point int16 output
(src/StereoMatch.cpp:169-187). This module re-implements the algorithm
from its published definition (Hirschmuller, PAMI'08 + the
Birchfield-Tomasi sampling-insensitive cost) rather than translating the
OpenCV code; semantics are specified exactly by the NumPy oracle in
tests/oracle_sgbm.py and may differ from OpenCV at bit level (documented
deltas: replicate-border window sums, gather-based right disparity for the
LR check).

TPU-first design:
  * pixel cost and 5x5 window sums are fused elementwise/reduce_window
    passes over a dense (H, W, D) int32 volume;
  * each of the 8 aggregation directions is a `lax.scan` linear recurrence
    whose per-step state is an (L, minL) pair over a full image line —
    the d-axis min/shift math is pure VPU work, and XLA pipelines the
    scans back-to-back;
  * diagonal directions reuse the vertical scan with a per-step lateral
    shift of the carry (a shear), avoiding any index remapping of the
    volume itself;
  * uniqueness / sub-pixel / LR-check are branch-free vector math.

All integer arithmetic is int32; L values are bounded by
max_window_cost + P2 << 2^31 so no overflow is possible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from primestereomatch_tpu.config import SGBMConfig

# large-but-safe sentinel (never participates in sums beyond one add)
_BIG = np.int32(1 << 28)  # plain numpy: module import must not initialize the backend
DISP_SCALE = 16  # OpenCV StereoMatcher::DISP_SCALE fixed-point factor


def clipped_xderiv(img_u8: jax.Array, cap: int) -> jax.Array:
    """Per-channel horizontal central difference clipped to [-cap, cap],
    shifted to [0, 2*cap] (a simplified prefilter variant; the pipeline
    default is `sobel_xclip`, which matches cv::StereoSGBM).

    img_u8: (H, W, C) uint8. Returns (H, W, C) int32. Border columns use
    replicated pixels (derivative -> one-sided difference contribution).
    """
    x = img_u8.astype(jnp.int32)
    left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    right = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    d = right - left
    return jnp.clip(d, -cap, cap) + cap


def sobel_xclip(img_u8: jax.Array, cap: int) -> jax.Array:
    """cv::StereoSGBM prefilter (the reference's actual component,
    src/StereoMatch.cpp:180/652): per-channel x-Sobel with [1,2,1]
    vertical smoothing, clipped to [-cap, cap], shifted to [0, 2*cap] —
    2*(I[y][x+1]-I[y][x-1]) + the same difference on rows y-1/y+1, with
    replicated borders. Empirically this is the cost function cv2 uses:
    switching from the plain central difference raised raw-argmin
    agreement with cv2.StereoSGBM on Teddy from 86% to 95% (and
    end-to-end %BP to within ~0.6 of cv2 — tests/test_sgbm_cv2_golden).

    img_u8: (H, W, C) uint8. Returns (H, W, C) int32 in [0, 2*cap].
    """
    x = img_u8.astype(jnp.int32)
    left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    right = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    d = right - left
    up = jnp.concatenate([d[:1], d[:-1]], axis=0)
    dn = jnp.concatenate([d[1:], d[-1:]], axis=0)
    sob = 2 * d + up + dn
    return jnp.clip(sob, -cap, cap) + cap


def _trunc_div(num: jax.Array, den: jax.Array) -> jax.Array:
    """C-style truncating integer division (lax.div rounds toward zero)."""
    return lax.div(num, den)


def _subpixel_frac(s_m, s_p, s_best, d_best, D):
    """OpenCV's integer sub-pixel refinement (computeDisparitySGBM):
    frac = trunc(((S[d-1] - S[d+1]) * 16 + denom2) / (2 * denom2)) with
    denom2 = max(curvature, 1); 0 at the d range ends."""
    interior = (d_best > 0) & (d_best < D - 1)
    denom2 = jnp.maximum(s_m + s_p - 2 * s_best, 1)
    num = (s_m - s_p) * DISP_SCALE + denom2
    return jnp.where(interior, _trunc_div(num, 2 * denom2), 0)


def _bt_cost_1d(l_ftr: jax.Array, r_ftr: jax.Array, max_dis: int) -> jax.Array:
    """Birchfield-Tomasi sampling-insensitive dissimilarity per pixel and
    disparity, summed over channels.

    l_ftr, r_ftr: (H, W, C) int32 feature images. Returns (H, W, D) int32.
    Out-of-image matches (x - d < 0) read the replicated border column.
    """
    H, W, C = l_ftr.shape

    # half-sample interpolants of the right feature signal
    r_prev = jnp.concatenate([r_ftr[:, :1], r_ftr[:, :-1]], axis=1)
    r_next = jnp.concatenate([r_ftr[:, 1:], r_ftr[:, -1:]], axis=1)
    r_lo = (r_ftr + r_prev) // 2
    r_hi = (r_ftr + r_next) // 2
    r_min = jnp.minimum(jnp.minimum(r_lo, r_hi), r_ftr)
    r_max = jnp.maximum(jnp.maximum(r_lo, r_hi), r_ftr)

    l_prev = jnp.concatenate([l_ftr[:, :1], l_ftr[:, :-1]], axis=1)
    l_next = jnp.concatenate([l_ftr[:, 1:], l_ftr[:, -1:]], axis=1)
    l_lo = (l_ftr + l_prev) // 2
    l_hi = (l_ftr + l_next) // 2
    l_min = jnp.minimum(jnp.minimum(l_lo, l_hi), l_ftr)
    l_max = jnp.maximum(jnp.maximum(l_lo, l_hi), l_ftr)

    # all-d sampling via left-replicated pads + dynamic slices inside a
    # `lax.map` over d-chunks: a fully unrolled Python loop over d emits
    # O(D) HLO ops and blew the remote compiler past 270 s at d>=128 —
    # chunking keeps the graph O(d_chunk) while the per-chunk work stays
    # wide enough that the few sequential map steps cost nothing
    def pad_l(a):
        return jnp.concatenate(
            [jnp.repeat(a[:, :1], max_dis, axis=1), a], axis=1
        )

    rm_p, rM_p, rf_p = pad_l(r_min), pad_l(r_max), pad_l(r_ftr)

    d_chunk = max_dis
    for cand in (32, 16, 8, 4, 2, 1):
        if max_dis % cand == 0:
            d_chunk = min(cand, max_dis)
            break

    def chunk(d0):
        outs = []
        for j in range(d_chunk):
            start = max_dis - d0 - j
            rm = lax.dynamic_slice_in_dim(rm_p, start, W, axis=1)
            rM = lax.dynamic_slice_in_dim(rM_p, start, W, axis=1)
            rf = lax.dynamic_slice_in_dim(rf_p, start, W, axis=1)
            c1 = jnp.maximum(jnp.maximum(l_ftr - rM, rm - l_ftr), 0)
            c2 = jnp.maximum(jnp.maximum(rf - l_max, l_min - rf), 0)
            outs.append(jnp.sum(jnp.minimum(c1, c2), axis=-1))
        return jnp.stack(outs, axis=-1)

    res = lax.map(chunk, jnp.arange(0, max_dis, d_chunk))
    # (n_chunks, H, W, d_chunk) -> (H, W, D) with d = chunk*d_chunk + j
    return jnp.moveaxis(res, 0, 2).reshape(H, W, max_dis)


def block_cost(pixel_cost: jax.Array, block_size: int) -> jax.Array:
    """Sum the per-pixel cost over a block_size x block_size window with
    replicated borders. (H, W, D) int32 -> (H, W, D) int32."""
    k = block_size
    if k == 1:
        return pixel_cost
    lo = k // 2
    hi = k - 1 - lo
    p = jnp.pad(pixel_cost, ((lo, hi), (lo, hi), (0, 0)), mode="edge")
    return lax.reduce_window(
        p, jnp.zeros((), p.dtype), lax.add, (k, k, 1), (1, 1, 1), "VALID"
    )


def _block_sum_sep_dhw(p: jax.Array, k: int) -> jax.Array:
    """Separable k x k window sum with replicated borders over the trailing
    two axes of (D, H, W) — H on sublanes, W on lanes, so every shift is
    full-occupancy VPU work. Edge-padding per axis commutes with the
    per-axis sums (corner pads replicate the corner pixel either way), so
    this is exactly `block_cost` as k shifted adds per axis instead of a
    k*k-read reduce_window."""
    if k == 1:
        return p
    lo = k // 2
    hi = k - 1 - lo
    H, W = p.shape[1], p.shape[2]
    py = jnp.pad(p, ((0, 0), (lo, hi), (0, 0)), mode="edge")
    acc = py[:, 0:H]
    for i in range(1, k):
        acc = acc + py[:, i : i + H]
    px = jnp.pad(acc, ((0, 0), (0, 0), (lo, hi)), mode="edge")
    acc = px[:, :, 0:W]
    for i in range(1, k):
        acc = acc + px[:, :, i : i + W]
    return acc


def bt_block_cost(
    l_ftr: jax.Array,
    r_ftr: jax.Array,
    max_dis: int,
    block_size: int,
    cost_bound: int | None = None,
    feat_bound: int | None = None,
    out_layout: str = "hwd",
) -> jax.Array:
    """Fused BT pixel cost + block window sum, chunked over d.

    Value-identical to `block_cost(_bt_cost_1d(l, r, D), block_size)`
    (modulo `out_layout`), but engineered for TPU memory layout and HBM
    bandwidth — the terms that dominate this stage at 2K/d=256 (unfused:
    ~125 ms; fused but pixel-layout: ~111 ms):

      * ALL internal arrays keep W on the minor (lane) axis: features are
        (C, H, W) and the output is built (D, H, W). A (H, W, 3) array on
        TPU pads its 3-wide minor dim to the 128-lane tile — a 42x
        physical inflation that turns the per-d feature re-reads into the
        whole stage cost;
      * the pixel-cost volume never reaches HBM: each d-chunk is
        window-summed immediately (two separable shifted-add passes) and
        only the block cost is written, in int16 when `cost_bound`
        (static bound on the window cost, block^2 * ch * 2 *
        pre_filter_cap) fits;
      * ONE dynamic slice per d-chunk, then static per-d lane shifts
        inside the chunk (dynamic-start slices materialize copies);
      * feature interpolants are stored at `feat_bound` width (int8 for
        the reference pre_filter_cap=63 whose features live in [0, 126])
        and widened in-register per use.

    out_layout: "dhw" returns (D, H, W) — the layout the aggregation
    kernels consume (their scan operands put the line axis on lanes);
    "hwd" returns the conventional (H, W, D).
    """
    H, W, C = l_ftr.shape
    out_dt = jnp.int32
    if cost_bound is not None and int(cost_bound) < 2**15:
        out_dt = jnp.int16
    # per-pixel BT cost is <= C * 2 * cap; the int16 cast below is safe
    # whenever the block bound (k^2 times larger) is
    feat_dt = jnp.int32
    if feat_bound is not None:
        if int(feat_bound) <= 127:
            feat_dt = jnp.int8
        elif int(feat_bound) < 2**15:
            feat_dt = jnp.int16

    lc = jnp.transpose(l_ftr, (2, 0, 1))  # (C, H, W): W on lanes
    rc = jnp.transpose(r_ftr, (2, 0, 1))

    def interp(f):
        prev = jnp.concatenate([f[..., :1], f[..., :-1]], axis=-1)
        nxt = jnp.concatenate([f[..., 1:], f[..., -1:]], axis=-1)
        lo = (f + prev) // 2
        hi = (f + nxt) // 2
        return (
            jnp.minimum(jnp.minimum(lo, hi), f),
            jnp.maximum(jnp.maximum(lo, hi), f),
        )

    r_min, r_max = interp(rc)
    l_min, l_max = interp(lc)

    lf_n, lmin_n, lmax_n = (
        lc.astype(feat_dt), l_min.astype(feat_dt), l_max.astype(feat_dt)
    )

    def pad_l(a):
        a = a.astype(feat_dt)
        return jnp.concatenate(
            [jnp.repeat(a[..., :1], max_dis, axis=-1), a], axis=-1
        )

    rm_p, rM_p, rf_p = pad_l(r_min), pad_l(r_max), pad_l(rc)

    d_chunk = max_dis
    for cand in (32, 16, 8, 4, 2, 1):
        if max_dis % cand == 0:
            d_chunk = min(cand, max_dis)
            break

    cwidth = W + d_chunk - 1

    def chunk(d0):
        # disparity d0 + j reads right columns x - d0 - j; the union over
        # the chunk is one window of cwidth columns, sliced ONCE
        start = max_dis - d0 - (d_chunk - 1)
        rm_c = lax.dynamic_slice_in_dim(rm_p, start, cwidth, axis=-1)
        rM_c = lax.dynamic_slice_in_dim(rM_p, start, cwidth, axis=-1)
        rf_c = lax.dynamic_slice_in_dim(rf_p, start, cwidth, axis=-1)
        outs = []
        for j in range(d_chunk):
            o = d_chunk - 1 - j
            rm = rm_c[..., o : o + W].astype(jnp.int32)
            rM = rM_c[..., o : o + W].astype(jnp.int32)
            rf = rf_c[..., o : o + W].astype(jnp.int32)
            c1 = jnp.maximum(jnp.maximum(lf_n - rM, rm - lf_n), 0)
            c2 = jnp.maximum(jnp.maximum(rf - lmax_n, lmin_n - rf), 0)
            outs.append(jnp.sum(jnp.minimum(c1, c2), axis=0).astype(out_dt))
        return _block_sum_sep_dhw(jnp.stack(outs, axis=0), block_size)

    res = lax.map(chunk, jnp.arange(0, max_dis, d_chunk))
    dhw = res.reshape(max_dis, H, W)
    if out_layout == "dhw":
        return dhw
    return jnp.transpose(dhw, (1, 2, 0))


def _dp_line_stack(
    costs: jax.Array, p1: int, p2: int, shifts, lane_plane=None,
    lane_groups=None, out_dtype=jnp.int32, unroll: int = 8,
) -> jax.Array:
    """Several directions sharing one `lax.scan`: costs (T, P, N, D) where
    P holds distinct cost planes and lane s (shifting laterally by
    shifts[s] per step) consumes plane lane_plane[s] — so directions that
    read the SAME rows (straight + both shears) share one HBM-resident
    plane instead of three copies, and forward + backward y-directions
    ride ONE scan (plane 1 = the flipped volume). Per-direction math:
    Hirschmuller's L_r(p, d) = C + min(Lp[d], Lp[d+-1]+P1, minLp+P2) -
    minLp, with missing predecessors (first step, sheared-in lanes)
    contributing L=0/minL=0 exactly like the standard border
    initialization; batching directions into the scan state cuts the
    number of sequential scan loops (the wall-clock cost of SGBM on TPU is
    dominated by sequential scan steps, not FLOPs).

    lane_plane=None means P == len(shifts) with the identity mapping.
    lane_groups: optional tuple of lane-index tuples; the emitted tensor
    then holds the per-step SUM over each group instead of every lane —
    at 2K/d=256 the six MODE_HH lanes would otherwise materialize a
    (H, 6, W, D) int32 tensor (~17 GB, over HBM); two grouped sums in a
    narrow dtype fit easily. The per-step math is int32 regardless;
    out_dtype only narrows what is WRITTEN (callers guarantee range via
    the static cost bound — see `aggregate`).
    Returns (T, G, N, D) with G = len(lane_groups) (or S lanes ungrouped).
    """
    if lane_plane is None:
        lane_plane = tuple(range(len(shifts)))
    T, Pn, N, D = costs.shape
    Sn = len(shifts)
    p1 = jnp.int32(p1)
    p2 = jnp.int32(p2)

    def shift_dir(Lp, minLp, sh):
        if sh == 1:
            Lp = jnp.concatenate([jnp.zeros_like(Lp[:1]), Lp[:-1]], axis=0)
            minLp = jnp.concatenate([jnp.zeros_like(minLp[:1]), minLp[:-1]], axis=0)
        elif sh == -1:
            Lp = jnp.concatenate([Lp[1:], jnp.zeros_like(Lp[:1])], axis=0)
            minLp = jnp.concatenate([minLp[1:], jnp.zeros_like(minLp[:1])], axis=0)
        return Lp, minLp

    def step(carry, c):
        Lp, minLp = carry  # (S, N, D), (S, N, 1)
        parts_L = []
        parts_m = []
        for si, sh in enumerate(shifts):
            lp, ml = shift_dir(Lp[si], minLp[si], sh)
            parts_L.append(lp)
            parts_m.append(ml)
        Lp = jnp.stack(parts_L)
        minLp = jnp.stack(parts_m)
        d_lo = jnp.concatenate(
            [jnp.full_like(Lp[..., :1], _BIG), Lp[..., :-1]], axis=-1
        )
        d_hi = jnp.concatenate(
            [Lp[..., 1:], jnp.full_like(Lp[..., :1], _BIG)], axis=-1
        )
        best = jnp.minimum(
            jnp.minimum(Lp, jnp.minimum(d_lo, d_hi) + p1), minLp + p2
        )
        c_lanes = c if lane_plane == tuple(range(Sn)) else c[jnp.asarray(lane_plane)]
        L = c_lanes.astype(jnp.int32) + best - minLp
        if lane_groups is None:
            out = L.astype(out_dtype)
        else:
            out = jnp.stack(
                [sum(L[i] for i in grp) for grp in lane_groups]
            ).astype(out_dtype)
        return (L, jnp.min(L, axis=-1, keepdims=True)), out

    init = (
        jnp.zeros((Sn, N, D), jnp.int32),
        jnp.zeros((Sn, N, 1), jnp.int32),
    )
    # unroll: the recurrence depth is fixed, but amortizing the scan loop
    # overhead over several steps matters more than the op-count here
    _, Ls = lax.scan(step, init, costs, unroll=unroll)
    return Ls  # (T, G, N, D)


def aggregate(
    cost: jax.Array, p1: int, p2: int, num_directions: int = 8,
    cost_bound: int | None = None,
) -> jax.Array:
    """Sum the DP aggregation over scan directions.

    cost: (H, W, D) integer window cost. num_directions: 8 (MODE_HH,
    the reference setting src/StereoMatch.cpp:656) aggregates W<->E, N<->S
    and both diagonals both ways; 5 (MODE_SGBM) uses the causal set
    {W->E, E->W, N->S, NW->SE, NE->SW}; 3 (MODE_SGBM_3WAY, the 'm'-key
    cycle src/main.cpp:161-163) uses {W->E, E->W, N->S} — the direction
    set OpenCV's SGBM3WayMainLoop aggregates.

    The 8 directions ride 3 scans: W->E and E->W share one x-scan (the
    E->W lane consumes the x-flipped volume), and the three downward /
    three upward directions (straight + both shears) share one y-scan
    each. Integer arithmetic makes the direction summation order exact.

    cost_bound: static upper bound on the window cost values (the pipeline
    passes block_size^2 * channels * 2 * pre_filter_cap). Any direction's
    L is <= cost_bound + p2 by induction (best - minL <= p2), so when the
    3-lane group sums fit uint16 the scans EMIT narrow dtypes — at
    2K/d=256 the six MODE_HH lanes in int32 would materialize ~17 GB
    (over HBM); grouped uint16 sums are 1/6 of that. Values are identical:
    the per-step math is int32 and only in-range writes are narrowed.
    """
    H, W, D = cost.shape
    if num_directions not in (3, 5, 8):
        raise ValueError(f"num_directions must be 3, 5 or 8, got {num_directions}")

    l_bound = None if cost_bound is None else int(cost_bound) + int(p2)
    lane_dt = jnp.int32
    group_dt = jnp.int32
    cost_dt = cost.dtype
    if l_bound is not None:
        if l_bound < 2**15:
            lane_dt = jnp.int16
            if int(cost_bound) < 2**15:
                cost_dt = jnp.int16
        if 3 * l_bound < 2**16:
            group_dt = jnp.uint16

    cost = cost.astype(cost_dt)
    cw = jnp.transpose(cost, (1, 0, 2))  # (W, H, D) — x-scans
    x_pair = jnp.stack([cw, jnp.flip(cw, axis=0)], axis=1)  # (W, 2, H, D)
    Lx = _dp_line_stack(x_pair, p1, p2, (0, 0), out_dtype=lane_dt)
    S = jnp.transpose(Lx[:, 0], (1, 0, 2)).astype(jnp.int32)      # W -> E
    S = S + jnp.transpose(jnp.flip(Lx[:, 1], axis=0), (1, 0, 2))  # E -> W

    if num_directions == 3:
        Ld = _dp_line_stack(cost[:, None], p1, p2, (0,), out_dtype=lane_dt)
        return S + Ld[:, 0]                                 # N->S only

    if num_directions == 5:
        # three downward lanes sharing ONE cost plane (straight + shears),
        # summed inside the scan step (N->S + NW->SE + NE->SW)
        Ld = _dp_line_stack(
            cost[:, None], p1, p2, (0, 1, -1), (0, 0, 0),
            lane_groups=((0, 1, 2),), out_dtype=group_dt,
        )
        return S + Ld[:, 0]

    # MODE_HH: all six y-directions ride ONE scan — lanes 0-2 consume the
    # natural row order, lanes 3-5 the flipped volume (plane 1), so the
    # sequential y latency is paid once, not twice; each 3-lane group is
    # summed inside the step so only two planes ever hit HBM
    pair = jnp.stack([cost, jnp.flip(cost, axis=0)], axis=1)  # (H, 2, W, D)
    Lb = _dp_line_stack(
        pair, p1, p2, (0, 1, -1, 0, 1, -1), (0, 0, 0, 1, 1, 1),
        lane_groups=((0, 1, 2), (3, 4, 5)), out_dtype=group_dt,
    )
    S = S + Lb[:, 0]
    S = S + jnp.flip(Lb[:, 1], axis=0)
    return S


def _lr_dual_check(disp16, disp2, inv_val, disp12_max_diff, min_disparity):
    """OpenCV's floor/ceil dual LR check: invalidate a valid pixel only if
    BOTH rounded disparities look up a VALID disp2 entry that is
    inconsistent. disp2 holds actual disparities (invalid = minD - 1)."""
    H, W = disp16.shape
    x = jnp.arange(W)[None, :]
    valid = disp16 != inv_val
    d_f = jnp.right_shift(disp16, 4)
    d_c = jnp.right_shift(disp16 + DISP_SCALE - 1, 4)

    def look(dd):
        xi = x - dd
        ok = (xi >= 0) & (xi < W)
        v = jnp.take_along_axis(disp2, jnp.clip(xi, 0, W - 1), axis=1)
        return ok & (v >= min_disparity), v

    okf, vf = look(d_f)
    okc, vc = look(d_c)
    lr_bad = (
        valid
        & okf & (jnp.abs(vf - d_f) > disp12_max_diff)
        & okc & (jnp.abs(vc - d_c) > disp12_max_diff)
    )
    if disp12_max_diff < 0:
        return disp16
    return jnp.where(lr_bad, inv_val, disp16)


def select_disparity(
    S: jax.Array,              # (H, W, D) int32 aggregated cost
    uniqueness_ratio: int,
    disp12_max_diff: int,
    min_disparity: int = 0,
) -> jax.Array:
    """WTA + uniqueness + sub-pixel + left-right consistency with
    cv::StereoSGBM's semantics (see tests/oracle_sgbm.py::select_disparity
    for the loop-form spec): scatter-based pseudo right disparity, dual
    floor/ceil LR check, integer truncating sub-pixel, minX band.

    Returns int16 disparity scaled by DISP_SCALE=16; invalid pixels get
    (min_disparity - 1) * 16 (the OpenCV convention the reference rescales
    for display, src/StereoMatch.cpp:181-186).
    """
    H, W, D = S.shape
    minD = min_disparity
    minX1 = max(minD + D, 0)
    maxX1 = W + min(minD, 0)
    d_best = jnp.argmin(S, axis=-1)                      # (H, W)
    s_best = jnp.min(S, axis=-1)

    # uniqueness: some d with |d - d_best| > 1 and S[d]*(100-u) < minS*100
    d_idx = jnp.arange(D)[None, None, :]
    far = jnp.abs(d_idx - d_best[..., None]) > 1
    # S <= 8 dirs * (max window cost + P2) ~ 1e5, so S*100 fits int32 safely
    close_cost = S * (100 - uniqueness_ratio) < s_best[..., None] * 100
    not_unique = jnp.any(far & close_cost, axis=-1)

    # sub-pixel neighbour costs via masked reductions (no gathers)
    is_m = d_idx == jnp.clip(d_best - 1, 0, D - 1)[..., None]
    is_p = d_idx == jnp.clip(d_best + 1, 0, D - 1)[..., None]
    s_m = jnp.min(jnp.where(is_m, S, _BIG), axis=-1)
    s_p = jnp.min(jnp.where(is_p, S, _BIG), axis=-1)
    frac = _subpixel_frac(s_m, s_p, s_best, d_best, D)
    disp16 = (d_best.astype(jnp.int32) + minD) * DISP_SCALE + frac

    x = jnp.arange(W)[None, :]
    in_range = (x >= minX1) & (x < maxX1)
    valid0 = in_range & ~not_unique
    inv_val = jnp.int32((minD - 1) * DISP_SCALE)
    disp16 = jnp.where(valid0, disp16, inv_val)

    # pseudo right disparity by scatter: right pixel xr = x - (d + minD)
    # takes the lowest s_best among unique left pixels whose d_best == d;
    # ascending d with strict < keeps the earliest x on ties (the order
    # OpenCV's ascending-x scatter loop produces)
    cand = jnp.where(valid0, s_best, _BIG)
    d2cost = jnp.full((H, W), _BIG, jnp.int32)
    disp2 = jnp.full((H, W), minD - 1, jnp.int32)

    def shift_left(a, sh, fill):
        if sh == 0:
            return a
        if sh > 0:
            return jnp.pad(a[:, sh:], ((0, 0), (0, sh)), constant_values=fill)
        return jnp.pad(a[:, :sh], ((0, 0), (-sh, 0)), constant_values=fill)

    for d in range(D):
        cd = jnp.where(d_best == d, cand, _BIG)
        cd = shift_left(cd, d + minD, _BIG)
        take = cd < d2cost
        d2cost = jnp.where(take, cd, d2cost)
        disp2 = jnp.where(take, d + minD, disp2)

    return _lr_dual_check(
        disp16, disp2, inv_val, disp12_max_diff, minD
    ).astype(jnp.int16)


def select_disparity_hdw(
    S: jax.Array,              # (H, D, W) int32 aggregated cost
    uniqueness_ratio: int,
    disp12_max_diff: int,
    min_disparity: int = 0,
) -> jax.Array:
    """`select_disparity` for (H, D, W) layout — bit-identical results.

    W stays on lanes throughout: the d-axis reductions run over sublanes
    at full lane occupancy. The volume is streamed ONCE through a chunked
    fori_loop producing (d_best, s_best, far-min, sub-pixel neighbours);
    the pseudo right disparity then comes from a D-step walk over SMALL
    (H, W) planes only — the scatter disp2[x - d_best] = min s_best is
    expressed as a descending-d running pair that shifts one lane per
    step (the transition xr + d -> xr + d - 1 is a single left shift),
    with `<=` making the LOWER d win ties exactly like OpenCV's
    ascending-x first-write-strict-> scatter order.
    """
    H, D, W = S.shape
    minD = min_disparity
    minX1 = max(minD + D, 0)
    maxX1 = W + min(minD, 0)
    d_best = jnp.argmin(S, axis=1)                       # (H, W)
    s_best = jnp.min(S, axis=1)

    # ONE chunked pass over S for the far-set min (uniqueness) and the
    # exact d_best -/+ 1 neighbour costs (the naive forms each re-read
    # the 2.8 GB volume at 2K/d=256). 16 planes per trip fuse into one
    # kernel, so the running planes re-stream HBM D/16 times, not D times.
    DCs = max(c for c in range(1, min(16, D) + 1) if D % c == 0)
    dm_i = jnp.clip(d_best - 1, 0, D - 1)
    dp_i = jnp.clip(d_best + 1, 0, D - 1)

    def _trip(t, carry):
        s_alt, s_m, s_p = carry
        c0 = t * DCs
        blk = jax.lax.dynamic_slice_in_dim(S, c0, DCs, axis=1)
        for k in range(DCs):
            plane = blk[:, k, :]
            d_cur = c0 + k
            # min over |d - d_best| > 1 (uniqueness), and the exact
            # d_best -/+ 1 neighbour costs (clipped-index equality selects
            # match exactly once, so overwrite == the masked min)
            far = jnp.abs(d_cur - d_best) > 1
            s_alt = jnp.where(far, jnp.minimum(s_alt, plane), s_alt)
            s_m = jnp.where(d_cur == dm_i, plane, s_m)
            s_p = jnp.where(d_cur == dp_i, plane, s_p)
        return s_alt, s_m, s_p

    big2 = jnp.full((H, W), _BIG, jnp.int32)
    s_alt, s_m, s_p = jax.lax.fori_loop(
        0, D // DCs, _trip, (big2, big2, big2)
    )

    # any_d [far & S_d*(100-u) < s_best*100] == s_alt*(100-u) < s_best*100
    # (s_alt is the exact min over the far set; empty far set — possible
    # only for D <= 3 — keeps s_alt at BIG, masked to False as the empty
    # `any` would be)
    not_unique = (s_alt < _BIG) & (
        s_alt * (100 - uniqueness_ratio) < s_best * 100
    )

    frac = _subpixel_frac(s_m, s_p, s_best, d_best, D)
    disp16 = (d_best.astype(jnp.int32) + minD) * DISP_SCALE + frac

    x = jnp.arange(W)[None, :]
    in_range = (x >= minX1) & (x < maxX1)
    valid0 = in_range & ~not_unique
    inv_val = jnp.int32((minD - 1) * DISP_SCALE)
    disp16 = jnp.where(valid0, disp16, inv_val)

    # disp2 walk on (H, W) planes: descending d, running (cost, d) pair
    # in the shifted frame x = xr + d; each d -> d-1 transition is one
    # left shift (BIG entering at the right edge)
    cand = jnp.where(valid0, s_best, _BIG)

    def _wstep(t, carry):
        m2, a2 = carry
        d = D - 1 - t
        m2 = jnp.pad(m2[:, 1:], ((0, 0), (0, 1)), constant_values=_BIG)
        a2 = jnp.pad(a2[:, 1:], ((0, 0), (0, 1)))
        sel = jnp.where(d_best == d, cand, _BIG)
        take = sel <= m2                   # later (smaller) d wins ties
        return jnp.where(take, sel, m2), jnp.where(take, d, a2)

    m2, a2 = jax.lax.fori_loop(
        0, D, _wstep, (big2, jnp.zeros((H, W), jnp.int32))
    )
    if minD > 0:       # frame at d=0 is xr + minD: one more static shift
        m2 = jnp.pad(m2[:, minD:], ((0, 0), (0, minD)), constant_values=_BIG)
        a2 = jnp.pad(a2[:, minD:], ((0, 0), (0, minD)))
    elif minD < 0:
        m2 = jnp.pad(m2[:, :minD], ((0, 0), (-minD, 0)), constant_values=_BIG)
        a2 = jnp.pad(a2[:, :minD], ((0, 0), (-minD, 0)))
    disp2 = jnp.where(m2 < _BIG, a2 + minD, minD - 1)

    return _lr_dual_check(
        disp16, disp2, inv_val, disp12_max_diff, minD
    ).astype(jnp.int16)


def filter_speckles(
    disp16: jax.Array,         # (H, W) int16 fixed-point disparities
    max_speckle_size: int,
    max_diff: int,             # on the SAME scale as disp16 (16 * range)
    invalid_value: int,
    max_iters: int | None = None,
    steps_per_check: int = 2,
    impl: str = "auto",        # auto | xla | pallas (sweep implementation)
) -> jax.Array:
    """Invalidate small connected components of similar disparity
    (cv::filterSpeckles semantics: 4-connectivity, |d(p)-d(q)| <= max_diff,
    components with area <= max_speckle_size are set to invalid_value).

    TPU-native connected components: min-label propagation inside a
    `lax.while_loop` whose body is one 4-neighbour hook step plus four
    SEGMENTED min-scans (associative_scan along rows forward/backward and
    columns down/up, segment boundaries = broken connectivity). A scan
    carries the minimum across an entire straight run in one shot, so the
    iteration count is the number of BENDS in the worst min-label path —
    not its length — and serpentine components converge orders of magnitude
    before any path-length bound. The loop runs purely on the `changed`
    flag (labels strictly decrease, so termination is guaranteed); it is
    exact, not capped. Everything is vector math — no gathers: an earlier
    pointer-jumping variant (lbl <- lbl[lbl]) was O(log path) in iterations
    but its per-iteration HW gather cost ~580 ms/frame on TPU vs ~1 ms for
    this formulation. Area via one scatter-add.

    max_iters: optional hard cap for tests/adversarial inputs; None (the
    default) means run to convergence.

    steps_per_check: propagation sweeps per `while_loop` iteration. Each
    while-loop predicate is a device->host sync; batching sweeps cuts the
    sync count to ceil(rounds / steps_per_check) while the extra
    converged sweeps are idempotent vector math. Results are identical
    for any value. v5e sweep on real pipeline disparities (best-of-3
    wall): 2K 29.1 / 30.5 / 33.1 / 39.6 ms at spc 2/4/8/16, Teddy
    2.42 / 2.47 / 2.53 at 2/4/8 — natural-content labels converge in few
    sweeps, so extra batched sweeps now cost more than the syncs they
    save (the opposite held in an earlier relay generation; default
    moved 4 -> 2 accordingly).

    impl: 'pallas' runs each sweep's four segmented scans as two Pallas
    launches with the whole scan axis VMEM-resident
    (kernels/speckle_pallas.py) — the XLA associative_scan lowering costs
    ~30 ms per sweep at 2K vs ~1 ms fused; 'auto' = pallas on TPU.
    Results are bit-identical.
    """
    H, W = disp16.shape
    d = disp16.astype(jnp.int32)
    valid = d != invalid_value

    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    labels0 = jnp.where(valid, lin, jnp.int32(H * W))

    big = jnp.int32(H * W)

    # everything below runs on TILE-ALIGNED padded planes (padding labels =
    # big, padding conn = False, i.e. fully disconnected — it can never win
    # a min or bridge segments). Padding ONCE here makes the per-sweep pads
    # inside segmin_sweep_pallas identity no-ops: re-padding four 11 MB
    # planes every sweep was ~half the per-sweep cost at 2K.
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    pad_hw = ((0, Hp - H), (0, Wp - W))

    def neighbors(lbl):
        up = jnp.concatenate([lbl[:1] * 0 + big, lbl[:-1]], axis=0)
        dn = jnp.concatenate([lbl[1:], lbl[:1] * 0 + big], axis=0)
        lf = jnp.concatenate([lbl[:, :1] * 0 + big, lbl[:, :-1]], axis=1)
        rt = jnp.concatenate([lbl[:, 1:], lbl[:, :1] * 0 + big], axis=1)
        return up, dn, lf, rt

    d_up = jnp.concatenate([d[:1], d[:-1]], axis=0)
    d_dn = jnp.concatenate([d[1:], d[-1:]], axis=0)
    d_lf = jnp.concatenate([d[:, :1], d[:, :-1]], axis=1)
    d_rt = jnp.concatenate([d[:, 1:], d[:, -1:]], axis=1)
    conn_up = valid & jnp.roll(valid, 1, axis=0) & (jnp.abs(d - d_up) <= max_diff)
    conn_up = conn_up.at[0].set(False)
    conn_dn = valid & jnp.roll(valid, -1, axis=0) & (jnp.abs(d - d_dn) <= max_diff)
    conn_dn = conn_dn.at[-1].set(False)
    conn_lf = valid & jnp.roll(valid, 1, axis=1) & (jnp.abs(d - d_lf) <= max_diff)
    conn_lf = conn_lf.at[:, 0].set(False)
    conn_rt = valid & jnp.roll(valid, -1, axis=1) & (jnp.abs(d - d_rt) <= max_diff)
    conn_rt = conn_rt.at[:, -1].set(False)

    labels0 = jnp.pad(labels0, pad_hw, constant_values=H * W)
    conn_up = jnp.pad(conn_up, pad_hw)
    conn_dn = jnp.pad(conn_dn, pad_hw)
    conn_lf = jnp.pad(conn_lf, pad_hw)
    conn_rt = jnp.pad(conn_rt, pad_hw)

    def comb(a, b):
        # segmented min: flag True means "connected to the scan
        # predecessor"; the standard (associative) segmented-scan operator
        av, af = a
        bv, bf = b
        return jnp.where(bf, jnp.minimum(av, bv), bv), af & bf

    # forward/backward direction pairs ride ONE stacked scan each (the
    # backward lane consumes the flipped image); flipped masks are
    # loop-invariant so they are built once here
    conn_row = jnp.stack([conn_lf, conn_rt[:, ::-1]])
    conn_col = jnp.stack([conn_up, conn_dn[::-1]])

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    def hook(lbl):
        # take the min label over connected neighbours
        up, dn, lf, rt = neighbors(lbl)
        m = lbl
        m = jnp.minimum(m, jnp.where(conn_up, up, big))
        m = jnp.minimum(m, jnp.where(conn_dn, dn, big))
        m = jnp.minimum(m, jnp.where(conn_lf, lf, big))
        m = jnp.minimum(m, jnp.where(conn_rt, rt, big))
        return m

    if impl == "pallas":
        from primestereomatch_tpu.kernels.speckle_pallas import (
            segmin_sweep_pallas,
        )

        def sweep(lbl):
            m = hook(lbl)
            m = segmin_sweep_pallas(m, conn_lf, axis=1)
            return segmin_sweep_pallas(m, conn_up, axis=0)
    else:
        def sweep(lbl):
            m = hook(lbl)
            # run propagation: carry the min across whole straight
            # segments — rows (both directions) then columns (both)
            r, _ = lax.associative_scan(
                comb, (jnp.stack([m, m[:, ::-1]]), conn_row), axis=2
            )
            m = jnp.minimum(r[0], r[1][:, ::-1])
            c_, _ = lax.associative_scan(
                comb, (jnp.stack([m, m[::-1]]), conn_col), axis=1
            )
            return jnp.minimum(c_[0], c_[1][::-1])

    def body(state):
        lbl, _, it = state
        m = lbl
        for _ in range(steps_per_check):
            m = sweep(m)
        changed = jnp.any(m != lbl)
        return m, changed, it + steps_per_check

    if max_iters is None:
        def cond(state):
            _, changed, _ = state
            return changed
    else:
        def cond(state):
            _, changed, it = state
            return changed & (it < max_iters)

    labels, _, _ = lax.while_loop(cond, body, (labels0, jnp.bool_(True), 0))
    labels = labels[:H, :W]

    if impl == "pallas":
        # TPU: component areas via sort -> segment-sum -> sort-back.
        # XLA's scatter-add and gather serialize per element on TPU
        # (~24 ms EACH for the 2.7M-px area count + areas[labels] at 2K,
        # hint flags ignored), while lax.sort runs ~ms — two sorts plus
        # vector scans beat one scatter + one gather by ~18 ms. Exact:
        # pixels of a component are contiguous after sorting by label, the
        # segment sum counts valid members, and the second sort (keyed by
        # the carried original index, unique keys) restores pixel order.
        # Sort payloads are MINIMIZED (bitonic stages move every operand):
        # validity is derived from the sorted label itself (invalid pixels
        # keep label == H*W) and the answer rides back as ONE bit packed
        # into the un-sort key — 3 operand-arrays sorted instead of 5.
        speckle = _small_component_mask(labels, max_speckle_size)
    else:
        areas = jnp.zeros(H * W + 1, jnp.int32).at[labels.reshape(-1)].add(
            valid.reshape(-1).astype(jnp.int32)
        )
        speckle = valid & (areas[labels] <= max_speckle_size)
    return jnp.where(speckle, jnp.int16(invalid_value), disp16)


def _small_component_mask(labels: jax.Array, max_size: int) -> jax.Array:
    """valid & (component area <= max_size) with no scatter/gather — see
    filter_speckles. Valid pixels are exactly those with label < H*W, and
    a component's area is the count of its members (all of which are
    valid: the invalid label H*W forms its own segment)."""
    H, W = labels.shape
    flat = labels.reshape(-1)
    lin = jnp.arange(H * W, dtype=jnp.int32)
    s, pidx = lax.sort((flat, lin), num_keys=1)
    vs = (s != H * W).astype(jnp.int32)
    seg = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    csum = jnp.cumsum(vs)
    # segment total = csum at segment end - csum before segment start,
    # broadcast to members via max/min scans over the flagged positions
    before = jnp.where(
        seg, jnp.concatenate([jnp.zeros(1, jnp.int32), csum[:-1]]), -1
    )
    before = lax.associative_scan(jnp.maximum, before)
    is_end = jnp.concatenate([seg[1:], jnp.ones(1, bool)])
    at_end = jnp.where(is_end, csum, jnp.int32(1 << 30))
    at_end = lax.associative_scan(jnp.minimum, at_end[::-1])[::-1]
    area_sorted = at_end - before
    small = (s != H * W) & (area_sorted <= max_size)
    # un-sort ONE packed key: sorting by (pidx << 1 | small) IS sorting by
    # the unique pidx, so the low bit lands back at its pixel
    key2 = lax.sort((pidx << 1) | small.astype(jnp.int32))
    return (key2 & 1).astype(bool).reshape(H, W)
