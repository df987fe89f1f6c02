"""Pallas TPU kernel: FULLY fused CVC + FGF coefficient chain + WTA.

Round-4 state of the 2K/d=256 GIF tail (SCALING.md): cvc_lowmaps writes
the (4, D, HP, WT) coefficient-maps tensor to HBM (~1 GB/view) at 13% of
either roofline, and the poly WTA kernel re-reads it slab-by-slab
(~3.9 GB/view after the per-row-tile overlap) at 45% HBM / 43% VPU —
both "overhead-bound". This kernel deletes the HBM maps tensor entirely:
per (output row tile, disparity chunk) grid step it

  1. builds the s-disparity cost block IN VMEM from the tiny polyphase
     planes of the other view (the cvc_lowmaps construction,
     kernels/cvc_lowmaps_pallas.py — one dynamic lane rotate per chunk),
  2. runs the box/solve/box coefficient chain on it (the lowmaps math,
     kernels/lowmaps_pallas.py::_maps_chain, value-returning form),
  3. row-interpolates the fresh maps with the banded matmul and folds the
     polyphase column lerp + guide combine into the running (min, argmin)
     accumulators (the exact-static mode of
     kernels/wta_pallas.py::_wta_kernel_poly).

The maps exist only as VMEM values inside one grid step; HBM traffic
drops to the per-tile planes/stats/view blocks (~100-200 MB/frame at 2K
vs ~10 GB/frame for the two-kernel pipeline). Reference dataflow being
replaced: src/CVF_cl.cpp:226-281 (per-slice filter chain producing a
volume) + assets/dispsel.cl:74-123 (WTA re-reading it).

Applicability: exact-stride columns (W == P*w — the 2K / HD720 / ZED
configs), phase-periodic ratio, single column tile, s | D. The quasi
ratios (all Middlebury datasets) keep the cvc_lowmaps + poly-WTA pair.

Numerics: bitwise-identical to
fgf_wta_pallas_maps(cvc_fgf_low_maps_pallas(...), poly=True,
mask_d0=False) on output columns >= ncl = P//2:

  * the cost expression, reflect margins and chain are the same
    sequential-adds code (shared `_box_valid`, same association order);
  * the row-interp matmul contracts fewer rows (RSM ~ 10 vs the DMA
    slab's 8-aligned 24-32) but every extra row enters with an exact
    +0.0 weight, so the two-tap f32 HIGHEST contraction is unchanged;
  * the d=0 poison (a_*=0, b=D0_POISON) is applied to the same elements.

Columns J < ncl (clamped sx=0, the static phase slices would read the
junk col -1) are recomputed by the caller from a 9-column strip of the
XLA chain (`_left_edge_fixup`) — same role as the maps-reading fixup in
wta_pallas._wta_poly_run; these columns sit inside the left maxDis+1
band the reference's %BP evaluation zeroes (src/StereoMatch.cpp:277-280).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from primestereomatch_tpu.kernels.lowmaps_pallas import (
    D0_POISON,
    _box_valid,
    _round_up,
)
from primestereomatch_tpu.ops.guided_filter import _color_inverse_cov

MS = 2           # in-VMEM left maps margin (lanes for the sA slice)
# planner budget for the CONSERVATIVE _vmem_model below. Calibrated on
# v5e at 2K/d=256 against Mosaic's 16M scoped-stack limit: ISOLATED
# tile_h=64 (model 22.6M) compiles and runs (actual stack ~0.58x model;
# tile_h=96 at 32.5M OOMs at 18.78M actual) — but the SAME tile_h=64
# kernel inside the full stereo_gif_forward program OOMs at 16.73M
# (Mosaic stack depends on the operands' producer layouts, the exact
# failure mode CLAUDE.md records for cvc_lowmaps TH=32). In-pipeline
# factor ~0.74x model => model-space limit ~21.6M; 20M keeps tile_h=32
# (12.7M) in and 64 out. Explicit tile_h overrides remain available for
# isolated-kernel use.
VMEM_BUDGET = 20 << 20
# debug/tuning knob: row-interp matmul precision ("highest" = exact-f32
# 6-pass, the parity requirement; "default" = bf16 1-pass, BENCH ONLY)
_MM_PRECISION = "highest"
# debug-only stage ablation for perf attribution (bench scripts): set to
# "chain" to bypass the maps chain, "lerp" to bypass the phase lerps —
# WRONG RESULTS, timing only
_DEBUG_SKIP = ""


def _chain_vals(p, stat_blk, *, k: int):
    """The lowmaps coefficient chain, returning the four box-averaged maps
    as VALUES (lowmaps_pallas._maps_chain keeps per-map stores to bound
    VMEM; here the maps are consumed immediately by the row matmul, so
    they must all be live anyway). Same expression order -> bitwise-equal
    outputs."""
    m1 = k // 2
    inv_k2 = 1.0 / (k * k)
    TI = p.shape[1]
    WI = p.shape[2]
    ch = stat_blk[0, 0:3]
    mid_r = (m1, TI - m1)
    mid_c = (m1, WI - m1)
    mean_r = stat_blk[0, 3:6, mid_r[0]:mid_r[1], mid_c[0]:mid_c[1]]
    inv6 = stat_blk[0, 6:12, mid_r[0]:mid_r[1], mid_c[0]:mid_c[1]]

    mp = _box_valid(p, k, inv_k2)
    mIp = [_box_valid(ch[c][None] * p, k, inv_k2) for c in range(3)]
    cov = [mIp[c] - mean_r[c][None] * mp for c in range(3)]
    a_r = inv6[0][None] * cov[0] + inv6[1][None] * cov[1] + inv6[2][None] * cov[2]
    a_g = inv6[1][None] * cov[0] + inv6[3][None] * cov[1] + inv6[4][None] * cov[2]
    a_b = inv6[2][None] * cov[0] + inv6[4][None] * cov[1] + inv6[5][None] * cov[2]
    b = (
        mp
        - a_r * mean_r[0][None]
        - a_g * mean_r[1][None]
        - a_b * mean_r[2][None]
    )
    return tuple(_box_valid(t, k, inv_k2) for t in (a_r, a_g, a_b, b))


def _cvc_wta_kernel(
    planes_blk,   # (1, 4*s, TI, WB) other-view polyphase planes [b,g,r,grad]*s
    stat_blk,     # (1, 12, TI, WI)  ch_low(3) means(3) inv(6)
    view_blk,     # (1, 5, TI, WI)   sampled local view [b, g, r, grad, x]
    guide_blk,    # (3, P, TH, TWQ)  phase-major full-res guide tile
    ryw_blk,      # (1, TH, 128)     lane 0: ry_rel, lane 1: fy
    wx_blk,       # (1, 8, TWQ)      rows 0..P-1: per-phase lerp weights
    out_ref,      # (P, TH, TWQ) int32
    cost_scr,     # VMEM (s, TI, WI)
    best_scr,     # VMEM (P, TH, TWQ) f32
    arg_scr,      # VMEM (P, TH, TWQ) i32
    *, k: int, s: int, M: int, w: int, W: int, qmax: int,
    alpha: float, border_cost: float,
    tau1: float | None, tau2: float | None,
    is_left: bool, TH: int, P: int, TWQ: int, deltas: tuple,
    mm_precision=None,
):
    if mm_precision is None:
        mm_precision = {"highest": jax.lax.Precision.HIGHEST,
                        "default": jax.lax.Precision.DEFAULT}[_MM_PRECISION]
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    off = (qmax - c) if is_left else c
    WI = stat_blk.shape[3]
    base = MS + M                    # cost-block lane of low column 0

    ls0 = view_blk[0, 0]
    ls1 = view_blk[0, 1]
    ls2 = view_blk[0, 2]
    lg = view_blk[0, 3]
    xs = view_blk[0, 4]

    # per-chunk whole-pixel shift = one NON-NEGATIVE dynamic lane rotate
    # (Mosaic miscompiles negative dynamic rolls on non-power-of-two vreg
    # lane counts — kernels/cvc_lowmaps_pallas.py)
    WB = planes_blk.shape[3]
    planes_rot = pltpu.roll(planes_blk[0], WB - off, axis=2)

    def pair_cost(b0, b1, b2, bg):
        # same association order as ops/cost_volume.py::_pair_cost
        clr = jnp.abs(ls0 - b0) + jnp.abs(ls1 - b1) + jnp.abs(ls2 - b2)
        grd = jnp.abs(lg - bg)
        if tau1 is not None:
            clr = jnp.minimum(clr, tau1)
        if tau2 is not None:
            grd = jnp.minimum(grd, tau2)
        return alpha * clr + (1.0 - alpha) * grd

    bc = jnp.float32(border_cost)
    border = pair_cost(bc, bc, bc, bc)

    for j in range(s):
        pj = planes_rot[4 * j : 4 * j + 4, :, :WI]
        cost = pair_cost(pj[0], pj[1], pj[2], pj[3])
        d = (c * s + j).astype(jnp.float32)
        if is_left:
            mask = xs >= d            # src/CVC.cpp:151 (x - d >= 0)
        else:
            mask = xs < (W - d)       # src/CVC.cpp:163 (x + d < W)
        cost_scr[j] = jnp.where(mask, cost, border)

    # column reflect-101 around the data start (bitwise jnp.pad 'reflect')
    for t in range(M):
        cost_scr[:, :, base - 1 - t] = cost_scr[:, :, base + 1 + t]
        cost_scr[:, :, base + w + t] = cost_scr[:, :, base + w - 2 - t]

    a_r, a_g, a_b, b = _chain_vals(cost_scr[...], stat_blk, k=k)
    # d = 0 never wins (src/DispSel.cpp:96): poison the chunk-0 local
    # slice 0 exactly like the lowmaps producers (a_*=0, b=D0_POISON)
    d0sel = (c == 0) & (
        jax.lax.broadcasted_iota(jnp.int32, (s, 1, 1), 0) == 0
    )
    a_r = jnp.where(d0sel, 0.0, a_r)
    a_g = jnp.where(d0sel, 0.0, a_g)
    a_b = jnp.where(d0sel, 0.0, a_b)
    b = jnp.where(d0sel, D0_POISON, b)
    RSM = a_r.shape[1]
    CS = a_r.shape[2]
    maps4 = jnp.stack([a_r, a_g, a_b, b]).reshape(4 * s, RSM, CS)

    # row-interp matmul (wta_pallas _ROWMM_BATCHED layout: the batched
    # matmul emits (4, s, TH, CS) directly). Extra slab rows vs the DMA
    # kernel enter with exact +0.0 weights -> bitwise-equal taps.
    ry = ryw_blk[0, :, 0:1]
    fy = ryw_blk[0, :, 1:2]
    rr = jax.lax.broadcasted_iota(jnp.int32, (TH, RSM), 1)
    ry_i = ry.astype(jnp.int32)
    w_row = jnp.where(rr == ry_i, 1.0 - fy, 0.0) + jnp.where(rr == ry_i + 1, fy, 0.0)
    wr_b = jnp.broadcast_to(w_row, (4 * s, TH, RSM))
    rowed = jax.lax.dot_general(
        wr_b, maps4,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=mm_precision,
    ).reshape(4, s, TH, CS)

    sA = rowed[..., MS - 1 : MS - 1 + TWQ]
    sB = rowed[..., MS : MS + TWQ]
    sC = rowed[..., MS + 1 : MS + 1 + TWQ]

    @pl.when(c == 0)
    def _():
        best_scr[...] = jnp.full((P, TH, TWQ), jnp.inf, jnp.float32)
        arg_scr[...] = jnp.zeros((P, TH, TWQ), jnp.int32)

    for r in range(P):
        wx = wx_blk[0, r, :][None, None, :]

        def comb(s4):
            # combine-then-lerp, the poly WTA order (wta_pallas.py)
            return (
                s4[0] * guide_blk[0, r]
                + s4[1] * guide_blk[1, r]
                + s4[2] * guide_blk[2, r]
                + s4[3]
            )                                    # (s, TH, TWQ)

        a, bb = (
            (comb(sA), comb(sB)) if deltas[r] == -1
            else (comb(sB), comb(sC))
        )
        q = a * (1.0 - wx) + bb * wx
        c_min = jnp.min(q, axis=0)
        c_arg = (c * s + jnp.argmin(q, axis=0)).astype(jnp.int32)
        prev = best_scr[r]
        take = c_min < prev
        best_scr[r] = jnp.where(take, c_min, prev)
        arg_scr[r] = jnp.where(take, c_arg, arg_scr[r])

    @pl.when(c == nc - 1)
    def _():
        out_ref[...] = arg_scr[...]


def _cvc_wta_kernel_fori(
    planes_blk, stat_blk, view_blk, guide_blk, ryw_blk, wx_blk, out_ref,
    cost_scr,
    *, k: int, s: int, M: int, w: int, W: int, qmax: int, nc: int,
    alpha: float, border_cost: float,
    tau1: float | None, tau2: float | None,
    is_left: bool, TH: int, P: int, TWQ: int, deltas: tuple,
    mm_precision=None,
):
    """Chunk-loop-inside schedule: grid = (row tiles,), the disparity
    chunks run in a fori_loop with the (best, arg) fold as the carry —
    every input block is DMA'd exactly once per row tile (the grid-axis
    schedule re-streams them per chunk step, ~7 GB/view at 2K)."""
    if mm_precision is None:
        mm_precision = {"highest": jax.lax.Precision.HIGHEST,
                        "default": jax.lax.Precision.DEFAULT}[_MM_PRECISION]
    WI = stat_blk.shape[3]
    base = MS + M

    ls0 = view_blk[0, 0]
    ls1 = view_blk[0, 1]
    ls2 = view_blk[0, 2]
    lg = view_blk[0, 3]
    xs = view_blk[0, 4]
    WB = planes_blk.shape[3]

    def pair_cost(b0, b1, b2, bg):
        clr = jnp.abs(ls0 - b0) + jnp.abs(ls1 - b1) + jnp.abs(ls2 - b2)
        grd = jnp.abs(lg - bg)
        if tau1 is not None:
            clr = jnp.minimum(clr, tau1)
        if tau2 is not None:
            grd = jnp.minimum(grd, tau2)
        return alpha * clr + (1.0 - alpha) * grd

    bc = jnp.float32(border_cost)
    border = pair_cost(bc, bc, bc, bc)

    ry = ryw_blk[0, :, 0:1]
    fy = ryw_blk[0, :, 1:2]

    best0 = jnp.full((P, TH, TWQ), jnp.inf, jnp.float32)
    arg0 = jnp.zeros((P, TH, TWQ), jnp.int32)

    def chunk_body(c, carry):
        best, arg = carry
        off = (qmax - c) if is_left else c
        planes_rot = pltpu.roll(planes_blk[0], WB - off, axis=2)
        for j in range(s):
            pj = planes_rot[4 * j : 4 * j + 4, :, :WI]
            cost = pair_cost(pj[0], pj[1], pj[2], pj[3])
            d = (c * s + j).astype(jnp.float32)
            mask = (xs >= d) if is_left else (xs < (W - d))
            cost_scr[j] = jnp.where(mask, cost, border)
        for t in range(M):
            cost_scr[:, :, base - 1 - t] = cost_scr[:, :, base + 1 + t]
            cost_scr[:, :, base + w + t] = cost_scr[:, :, base + w - 2 - t]

        if _DEBUG_SKIP == "chain":
            sl = cost_scr[:, M : stat_blk.shape[2] - M, M : WI - M]
            a_r = a_g = a_b = b = sl * 0.25
        else:
            a_r, a_g, a_b, b = _chain_vals(cost_scr[...], stat_blk, k=k)
        d0sel = (c == 0) & (
            jax.lax.broadcasted_iota(jnp.int32, (s, 1, 1), 0) == 0
        )
        a_r = jnp.where(d0sel, 0.0, a_r)
        a_g = jnp.where(d0sel, 0.0, a_g)
        a_b = jnp.where(d0sel, 0.0, a_b)
        b = jnp.where(d0sel, D0_POISON, b)
        RSM = a_r.shape[1]
        CS = a_r.shape[2]
        maps4 = jnp.stack([a_r, a_g, a_b, b]).reshape(4 * s, RSM, CS)

        rr = jax.lax.broadcasted_iota(jnp.int32, (TH, RSM), 1)
        ry_i = ry.astype(jnp.int32)
        w_row = (
            jnp.where(rr == ry_i, 1.0 - fy, 0.0)
            + jnp.where(rr == ry_i + 1, fy, 0.0)
        )
        wr_b = jnp.broadcast_to(w_row, (4 * s, TH, RSM))
        rowed = jax.lax.dot_general(
            wr_b, maps4,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=mm_precision,
        ).reshape(4, s, TH, CS)

        sA = rowed[..., MS - 1 : MS - 1 + TWQ]
        sB = rowed[..., MS : MS + TWQ]
        sC = rowed[..., MS + 1 : MS + 1 + TWQ]

        if _DEBUG_SKIP == "lerp":
            q0 = sB[0] + sB[1] + sB[2] + sB[3]
            c_min = jnp.broadcast_to(q0.min(axis=0)[None], (P, TH, TWQ))
            c_arg = jnp.full((P, TH, TWQ), c * s, jnp.int32)
        else:
            mins, args_ = [], []
            for r in range(P):
                wx = wx_blk[0, r, :][None, None, :]

                def comb(s4):
                    return (
                        s4[0] * guide_blk[0, r]
                        + s4[1] * guide_blk[1, r]
                        + s4[2] * guide_blk[2, r]
                        + s4[3]
                    )

                a, bb = (
                    (comb(sA), comb(sB)) if deltas[r] == -1
                    else (comb(sB), comb(sC))
                )
                q = a * (1.0 - wx) + bb * wx
                mins.append(jnp.min(q, axis=0))
                args_.append((c * s + jnp.argmin(q, axis=0)).astype(jnp.int32))
            c_min = jnp.stack(mins)
            c_arg = jnp.stack(args_)
        take = c_min < best
        return jnp.where(take, c_min, best), jnp.where(take, c_arg, arg)

    best, arg = jax.lax.fori_loop(0, nc, chunk_body, (best0, arg0))
    out_ref[...] = arg


def _poly_exact_params(w: int, W: int) -> dict | None:
    """Exact-stride polyphase parameters (subset of
    wta_pallas.poly_col_params restricted to W == P*w, single column
    tile, phase-periodic)."""
    if w <= 0 or W % w:
        return None
    P = W // w
    if P <= 1 or P > 8:
        return None
    from primestereomatch_tpu.ops.resize import linear_coeffs

    TWQ = _round_up(w, 8)
    deltas = tuple(int(np.floor((r + 0.5) / P - 0.5)) for r in range(P))
    sxW, fxW = linear_coeffs(w, W)
    ks = np.arange(1, w - 1)
    for r in range(P):
        if not np.array_equal(sxW[P * ks + r], ks + deltas[r]):
            return None               # not phase-periodic
    ks_p = np.arange(TWQ)
    wx_tab = np.zeros((P, TWQ), np.float32)
    for r in range(P):
        j = np.minimum(P * ks_p + r, W - 1)
        wx_tab[r] = fxW[j]
    return {"P": P, "TWQ": TWQ, "deltas": deltas, "ncl": P // 2,
            "wx": wx_tab}


def _row_plan(h: int, H: int, TH: int):
    """Per-tile low-row windows for TH output rows (arbitrary — not
    8-aligned — starts: the maps are computed in VMEM, never DMA'd)."""
    from primestereomatch_tpu.ops.resize import linear_coeffs

    hp = _round_up(H, TH)
    nty = hp // TH
    sy, fy = linear_coeffs(h, H)
    sy = np.concatenate([sy, np.full(hp - H, sy[-1])])
    fy = np.concatenate([fy, np.full(hp - H, fy[-1], np.float32)])
    starts = sy[np.arange(nty) * TH].astype(np.int64)
    span = int((sy[np.minimum(np.arange(nty) * TH + TH - 1, hp - 1)]
                - starts).max())
    RSM = span + 2                   # + the fy tap row + exclusive end
    return hp, nty, sy, fy, RSM, starts.astype(np.int32)


def _vmem_model(s, M, TI, WI, WB, P, TH, TWQ, RSM):
    """Conservative VMEM estimate (lane dims padded to the 128 tile):
    double-buffered input/output blocks, cost + best/arg scratch, ~9
    chain intermediates at peak, the stacked maps + 2x rowed, and the
    per-phase lerp temporaries."""
    lane = lambda x: _round_up(x, 128)  # noqa: E731
    CS = WI - 2 * M
    items = (
        2 * (4 * s) * TI * lane(WB)
        + 2 * 12 * TI * lane(WI)
        + 2 * 5 * TI * lane(WI)
        + 2 * 3 * P * TH * lane(TWQ)
        + 2 * TH * 128
        + 2 * 8 * lane(TWQ)
        + 2 * P * TH * lane(TWQ)          # out blocks
        + s * TI * lane(WI)               # cost scratch
        + 2 * P * TH * lane(TWQ)          # best + arg scratch
        + 9 * s * TI * lane(WI)           # chain peak
        + 2 * 4 * s * RSM * lane(CS)      # maps4 (+ stack copy)
        + 2 * 4 * s * TH * lane(CS)       # rowed (+ layout headroom)
        + 5 * s * TH * lane(TWQ)          # lerp temps
    )
    return items * 4


def _plan_th(h, H, s, M, w, qmax, P, TWQ, budget=VMEM_BUDGET):
    """Largest output-rows-per-tile whose VMEM model fits."""
    WI = MS + 2 * M + TWQ + 1
    WB = _round_up(qmax + WI, 128)
    for th in (64, 32, 16, 8):
        _, _, _, _, RSM, _ = _row_plan(h, H, th)
        TI = RSM + 2 * M
        if _vmem_model(s, M, TI, WI, WB, P, th, TWQ, RSM) <= budget:
            return th
    return None


def cvc_wta_applicable(
    W: int, w: int, xi, max_dis: int, subsample: int, H: int, h: int,
    radius: int = 8,
) -> bool:
    """True when the fully fused CVC+maps+WTA kernel covers this
    geometry: exact column stride, phase-periodic integer ratio, s | D,
    and a VMEM plan exists."""
    xi = np.asarray(xi)
    s = subsample
    if len(xi) != w or W % w or W // w != s:
        return False
    if not np.array_equal(xi, np.arange(w) * s):
        return False
    if max_dis < s or max_dis % s:
        return False
    pp = _poly_exact_params(w, W)
    if pp is None:
        return False
    k = 2 * (radius // subsample) + 1
    M = 2 * (k // 2)
    return _plan_th(h, H, s, M, w, max_dis // s - 1, pp["P"], pp["TWQ"]) is not None


def cvc_fgf_wta_pallas(
    img: jax.Array,         # (H, W, 3) float32 local view (also the guide)
    grd: jax.Array,         # (H, W) float32 Sobel-x gradient of local view
    other_img: jax.Array,   # (H, W, 3) other view
    other_grd: jax.Array,   # (H, W)
    is_left: bool,
    max_dis: int,
    yi,                     # (h,) static numpy row sample indices
    xi,                     # (w,) static column indices — MUST be arange(w)*s
    radius: int = 8,
    eps: float = 1e-4,
    subsample: int = 4,
    alpha: float = 0.9,
    border_cost: float = 1.0,
    tau1: float | None = None,
    tau2: float | None = None,
    tile_h: int | None = None,
    schedule: str = "fori",   # "fori" (chunk loop in-kernel, blocks DMA'd
                              # once per row tile — measured faster at every
                              # tile_h on v5e) | "grid" (chunks on the grid
                              # axis; Pallas re-streams the input blocks
                              # per chunk step)
    interpret: bool = False,
) -> jax.Array:
    """Fully fused CVC + low-maps + WTA for one view: returns the (H, W)
    uint8 disparity map. Neither the cost volume nor the coefficient maps
    ever exist in HBM. Exact-stride phase-periodic geometries only —
    check `cvc_wta_applicable` first.

    vmap-able: frames dispatch sequentially (jax.lax.map — the per-frame
    kernel already saturates the chip)."""

    @jax.custom_batching.custom_vmap
    def run(a, ag, b, bg):
        return _cvc_fgf_wta_impl(
            a, ag, b, bg, is_left, max_dis, yi, xi, radius, eps, subsample,
            alpha, border_cost, tau1, tau2, tile_h, schedule, interpret,
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, a, ag, b, bg):  # noqa: ANN001
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size, *x.shape))

        args = [bcast(x, bb) for x, bb in zip((a, ag, b, bg), in_batched)]
        out = jax.lax.map(
            lambda xs: _cvc_fgf_wta_impl(
                *xs, is_left, max_dis, yi, xi, radius, eps, subsample,
                alpha, border_cost, tau1, tau2, tile_h, schedule, interpret,
            ),
            tuple(args),
        )
        return out, True

    return run(img, grd, other_img, other_grd)


def _left_edge_fixup(
    disp, img, grd, other_img, other_grd, is_left, max_dis, yi, xi,
    radius, eps, subsample, alpha, border_cost, tau1, tau2, ncl, sy, fy,
):
    """Recompute output columns J < ncl (clamped sx=0: the static phase
    slices read the junk col -1) from a 9-column strip of the XLA chain.
    The strip's box windows for maps col 0 consume guide cols <= 6 and
    cost cols <= 4 only, so a 9-column strip reproduces the full-image
    chain there exactly (reflect-101 left edge included); cf. the
    maps-reading fixup in wta_pallas._wta_poly_run."""
    from primestereomatch_tpu.ops.cost_volume import build_cost_volumes_sampled
    from primestereomatch_tpu.ops.guided_filter import fgf_low_maps

    H = img.shape[0]
    s = subsample
    k = 2 * (radius // subsample) + 1
    M = 2 * (k // 2)
    nstrip = 2 * M + 1                       # 9 low columns
    xi_s = np.asarray(xi)[:nstrip]
    if is_left:
        lcv, _ = build_cost_volumes_sampled(
            img, other_img, grd, other_grd, max_dis, yi, xi_s,
            alpha=alpha, border_cost=border_cost, tau1=tau1, tau2=tau2,
        )
    else:
        _, lcv = build_cost_volumes_sampled(
            other_img, img, other_grd, grd, max_dis, yi, xi_s,
            alpha=alpha, border_cost=border_cost, tau1=tau1, tau2=tau2,
        )
    guide_strip = img[:, : nstrip * s]
    mean_a, mean_b = fgf_low_maps(guide_strip, lcv, radius, eps, subsample)
    col0 = jnp.stack([*mean_a, mean_b])[:, :, :, 0]       # (4, D, h)
    h = col0.shape[2]
    D = max_dis
    sy_j = jnp.asarray(sy[:H])
    fy_j = jnp.asarray(fy[:H])
    r0v = jnp.take(col0, sy_j, axis=-1)
    r1v = jnp.take(col0, jnp.minimum(sy_j + 1, h - 1), axis=-1)
    qm = r0v * (1.0 - fy_j) + r1v * fy_j                  # (4, D, H)
    d_mask = (jnp.arange(D) == 0)[:, None]
    for J in range(ncl):
        g = img[:H, J, :]                                 # (H, 3)
        qJ = (
            qm[0] * g[:, 0][None]
            + qm[1] * g[:, 1][None]
            + qm[2] * g[:, 2][None]
            + qm[3]
        )                                                 # (D, H)
        qJ = jnp.where(d_mask, jnp.inf, qJ)
        dJ = jnp.argmin(qJ, axis=0).astype(disp.dtype)
        disp = disp.at[:, J].set(dJ)
    return disp


def _cvc_fgf_wta_impl(
    img, grd, other_img, other_grd, is_left, max_dis, yi, xi, radius, eps,
    subsample, alpha, border_cost, tau1, tau2, tile_h, schedule, interpret,
):
    H, W, _ = img.shape
    yi = np.asarray(yi)
    xi = np.asarray(xi)
    h, w = len(yi), len(xi)
    s = subsample
    D = max_dis
    if W % w or W // w != s or not np.array_equal(xi, np.arange(w) * s):
        raise ValueError("fused CVC+WTA needs exact-stride columns")
    if D % s:
        raise ValueError(f"max_dis {D} not divisible by subsample {s}")
    pp = _poly_exact_params(w, W)
    if pp is None:
        raise ValueError(f"column ratio {w}->{W} is not exact polyphase")
    P, TWQ, deltas, ncl = pp["P"], pp["TWQ"], pp["deltas"], pp["ncl"]
    qmax = D // s - 1
    k = 2 * (radius // subsample) + 1
    M = 2 * (k // 2)

    TH = tile_h if tile_h is not None else (32 if interpret else None)
    if TH is None:
        TH = _plan_th(h, H, s, M, w, qmax, P, TWQ)
        if TH is None:
            raise ValueError("fused CVC+WTA VMEM plan failed for this shape")
    hp, nty, sy, fy, RSM, starts = _row_plan(h, H, TH)
    TI = RSM + 2 * M
    WI = MS + 2 * M + TWQ + 1
    # lane-aligned so the in-kernel dynamic rotate has an aligned shape
    # (Mosaic: "unsupported unaligned shape" on tpu.dynamic_rotate otherwise)
    WB = _round_up(qmax + WI, 128)
    base = MS + M

    # ---- sampled local view + polyphase planes of the other view ----------
    # (the cvc_lowmaps prep, kernels/cvc_lowmaps_pallas.py, with the extra
    # MS-lane left margin so the chain emits the col -1 slice lane)
    a_rows = img[yi]
    ag_rows = grd[yi]
    b_rows = other_img[yi]
    bg_rows = other_grd[yi]
    a_s = a_rows[:, xi]
    ag_s = ag_rows[:, xi]

    b4 = jnp.concatenate([b_rows, bg_rows[..., None]], axis=-1)
    b4 = b4.reshape(h, w, s, 4)
    if is_left:
        planes = []
        for r in range(s):
            if r == 0:
                pr = b4[:, :, 0]
            else:
                pr = jnp.concatenate(
                    [b4[:, :1, s - r], b4[:, :-1, s - r]], axis=1
                )
            planes.append(jnp.pad(pr, ((0, 0), (qmax, 0), (0, 0))))
    else:
        planes = [
            jnp.pad(b4[:, :, r], ((0, 0), (0, qmax), (0, 0))) for r in range(s)
        ]
    planes = jnp.stack(planes)                        # (s, h, qmax+w, 4)
    planes = jnp.moveaxis(planes, -1, 1).reshape(4 * s, h, qmax + w)

    ch_low = tuple(a_s[..., ci] for ci in range(3))
    means, inv = _color_inverse_cov(ch_low, k, eps)
    stats = jnp.stack([*ch_low, *means, *inv], axis=0)          # (12, h, w)

    xs_f = jnp.broadcast_to(jnp.asarray(xi, jnp.float32)[None, :], (h, w))
    view5 = jnp.stack(
        [a_s[..., 0], a_s[..., 1], a_s[..., 2], ag_s, xs_f], axis=0
    )

    # ---- padding ----------------------------------------------------------
    need_rows = int(starts.max()) + TI                # in padded coords
    extra_r = max(0, need_rows - (h + 2 * M))

    def pad_rows(x):
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(M, M), (0, 0)],
                    mode="reflect")
        if extra_r:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, extra_r), (0, 0)],
                        mode="edge")
        return x

    def pad_cols_reflect(x, to):
        # reflect-101 box margins, then MS junk lanes on the left and
        # edge fill on the right (junk feeds weight-0 / fixed-up outputs)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(M, M)], mode="reflect")
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(MS, 0)], mode="edge")
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])],
                       mode="edge")

    stats_p = pad_rows(pad_cols_reflect(stats, WI))
    view_p = pad_rows(pad_cols_reflect(view5, WI))
    planes_p = pad_rows(
        jnp.pad(
            jnp.pad(planes, ((0, 0), (0, 0), (base, 0)), mode="edge"),
            ((0, 0), (0, 0), (0, WB - (qmax + w + base))), mode="edge",
        )
    )

    def tile_rows(x, C):
        return jnp.stack(
            [jax.lax.slice_in_dim(x, int(r0), int(r0) + TI, axis=-2)
             for r0 in starts], axis=0,
        )                                             # (nty, C, TI, ·)

    p_tiles = tile_rows(planes_p, 4 * s)
    s_tiles = tile_rows(stats_p, 12)
    v_tiles = tile_rows(view_p, 5)

    # ---- guide in phase-major layout + interp tables ----------------------
    gp = jnp.moveaxis(img, -1, 0)                     # (3, H, W)
    gp = jnp.pad(gp, ((0, 0), (0, hp - H), (0, 0)))
    gp = gp.reshape(3, hp, w, P)
    gp = jnp.transpose(gp, (0, 3, 1, 2))              # (3, P, hp, w)
    gp = jnp.pad(gp, ((0, 0), (0, 0), (0, 0), (0, TWQ - w)))

    ry_rel = (sy - np.repeat(starts, TH)).astype(np.float32)
    ryw = np.zeros((nty, TH, 128), np.float32)
    ryw[:, :, 0] = ry_rel.reshape(nty, TH)
    ryw[:, :, 1] = fy.reshape(nty, TH)

    wx = np.zeros((1, 8, TWQ), np.float32)
    wx[0, :P] = pp["wx"]

    if schedule == "fori":
        kernel = functools.partial(
            _cvc_wta_kernel_fori, k=k, s=s, M=M, w=w, W=W, qmax=qmax,
            nc=D // s, alpha=alpha, border_cost=border_cost,
            tau1=tau1, tau2=tau2,
            is_left=is_left, TH=TH, P=P, TWQ=TWQ, deltas=deltas,
        )
        out = pl.pallas_call(
            kernel,
            grid=(nty,),
            in_specs=[
                pl.BlockSpec((1, 4 * s, TI, WB), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, 12, TI, WI), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, 5, TI, WI), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((3, P, TH, TWQ), lambda i: (0, 0, i, 0)),
                pl.BlockSpec((1, TH, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, TWQ), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((P, TH, TWQ), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((P, hp, TWQ), jnp.int32),
            scratch_shapes=[pltpu.VMEM((s, TI, WI), jnp.float32)],
            interpret=interpret,
        )(p_tiles, s_tiles, v_tiles, gp, jnp.asarray(ryw), jnp.asarray(wx))
    else:
        kernel = functools.partial(
            _cvc_wta_kernel, k=k, s=s, M=M, w=w, W=W, qmax=qmax,
            alpha=alpha, border_cost=border_cost, tau1=tau1, tau2=tau2,
            is_left=is_left, TH=TH, P=P, TWQ=TWQ, deltas=deltas,
        )
        out = pl.pallas_call(
            kernel,
            grid=(nty, D // s),
            in_specs=[
                pl.BlockSpec((1, 4 * s, TI, WB), lambda i, c: (i, 0, 0, 0)),
                pl.BlockSpec((1, 12, TI, WI), lambda i, c: (i, 0, 0, 0)),
                pl.BlockSpec((1, 5, TI, WI), lambda i, c: (i, 0, 0, 0)),
                pl.BlockSpec((3, P, TH, TWQ), lambda i, c: (0, 0, i, 0)),
                pl.BlockSpec((1, TH, 128), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((1, 8, TWQ), lambda i, c: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((P, TH, TWQ), lambda i, c: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((P, hp, TWQ), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((s, TI, WI), jnp.float32),
                pltpu.VMEM((P, TH, TWQ), jnp.float32),
                pltpu.VMEM((P, TH, TWQ), jnp.int32),
            ],
            interpret=interpret,
        )(p_tiles, s_tiles, v_tiles, gp, jnp.asarray(ryw), jnp.asarray(wx))

    disp = jnp.transpose(out[:, :H, :w], (1, 2, 0)).reshape(H, w * P)[:, :W]
    disp = disp.astype(jnp.uint8)
    disp = _left_edge_fixup(
        disp, img, grd, other_img, other_grd, is_left, max_dis, yi, xi,
        radius, eps, subsample, alpha, border_cost, tau1, tau2, ncl, sy, fy,
    )
    return disp
