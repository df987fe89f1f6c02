"""Pallas TPU kernel: fused coefficient-map upsample + WTA argmin.

The STEREO_GIF match path ends with q(d) = up(mean_a)·I + up(mean_b)
followed by an argmin over d (ops/guided_filter.py + ops/wta.py). The XLA
formulation materializes four bilinearly-upsampled (D, H, W) tensors —
at 2K/d=256 that is 4 x 2.8 GB per view and a dense (w -> W) matmul whose
FLOPs scale with the low width instead of the filter's 2-tap band.

This kernel keeps the low-res maps in VMEM per (8 x 128) output tile and
d-chunk, and applies the bilinear interpolation as two SMALL banded
matmuls whose weight matrices are built in-kernel from precomputed
index/weight tables:

  rows: Wrow (8, RS)  @ slab (RS, 4*DC*CS)  — one MXU call per chunk
  cols: (4*DC*8, CS)  @ Wcol (CS, 128)      — one MXU call per chunk

q is then a fused elementwise combine with the guide tile and a running
(min, argmin) fold — the filtered volume never exists anywhere.

STATUS: bit-exact vs the lerp reference in interpreter mode. On a v5e
the (16, 384)-tile double-buffered schedule beats the XLA mxu path at
2K/d=256 (36.5 ms vs 45.4 ms per view) while never materializing the
4 x 2.8 GB upsampled tensors, and matches it at Middlebury sizes
(1.6 ms). Tile-size evolution (measured): (8,128) serial DMA 192 ms ->
full-M matmuls 194 ms -> double buffering 116 ms -> (16, 256) 44.5 ms ->
(16, 384) 36.5 ms. Wired as the default TPU WTA path
(GIFConfig.wta_impl='auto').

Exactness: the interpolation indices/weights are the same float32 values
`ops/resize.py::linear_coeffs` produces (computed host-side in f64); the
matmul adds explicit +0.0 band zeros. Ties in the argmin follow the
first-minimum rule (strict < across chunks, in-chunk argmin first-min).
DMA alignment: per-tile slab starts are pre-aligned host-side (rows to 8,
cols to 128) with the residual folded into the index tables.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from primestereomatch_tpu.ops.resize import linear_coeffs

TILE_H = 16
TILE_W = 384


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile_w(W: int) -> int:
    """Output-column tile for the generic kernel: smallest padded width
    wins (a fixed 384 padded Teddy's 450 columns to 768 — 70% waste
    columns), ties prefer the wider tile (longer matmul N runs)."""
    return min((512, 384, 256, 128), key=lambda t: (_round_up(W, t), -t))


def _gen_plan_dc(D: int, dc_req: int, RS: int, CS: int, TW: int,
                 budget: int = 12 << 20) -> int:
    """Largest disparity chunk (divisor of D, <= dc_req) whose VMEM
    footprint fits: double-buffered slab (2,4,DC,RS,CS), the row-interp
    result + its transpose (2 x 16*4*DC*CS), and q4/q (~5 x 4*DC*16*TW/4)
    f32, plus ~1 MB of fixed blocks."""
    fixed = 1 << 20
    for dc in range(min(dc_req, D), 0, -1):
        if D % dc:
            continue
        use = (8 * RS * CS + 192 * CS + 100 * TW) * dc * 4 + fixed
        if use <= budget:
            return dc
    return 1


def _wta_kernel(
    row_start_s, col_start_s,                 # SMEM scalar-prefetch tables
    maps_hbm, guide_blk, ryw_blk, cxw_blk, out_ref,
    slab, sem,
    *, n_maps: int, D: int, DC: int, RS: int, CS: int,
    TILE_W: int = TILE_W, mask_d0: bool = True,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    # starts are pre-aligned host-side; the hints let Mosaic prove it
    r0 = pl.multiple_of(row_start_s[i], 8)
    c0 = pl.multiple_of(col_start_s[j], 128)

    # --- banded interpolation matrices for this tile ----------------------
    # ryw_blk: (1, 8, 128) [ry | wy packed: lanes 0..7 hold ry (as f32),
    # lanes 8..15 hold wy]; cxw_blk: (1, 16, CS) [sublane 0: cx, 1: wx]
    ry = ryw_blk[0, :, 0:1]                   # (8, 1) f32 (integer-valued)
    wy = ryw_blk[0, :, 1:2]                   # (8, 1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, RS), 1)
    ry_i = ry.astype(jnp.int32)
    w_row = jnp.where(rr == ry_i, 1.0 - wy, 0.0) + jnp.where(rr == ry_i + 1, wy, 0.0)

    cx = cxw_blk[0, 0:1, :]                   # (1, CS) f32 holds target idx per out lane? see host packing
    wx = cxw_blk[0, 1:2, :]
    # host packs cx/wx indexed by OUTPUT lane (TILE_W wide, padded to CS);
    # build Wcol (CS, TILE_W) via iota compare over the source-col axis
    src = jax.lax.broadcasted_iota(jnp.int32, (CS, TILE_W), 0)
    cxv = cx[:, :TILE_W].astype(jnp.int32)    # (1, TILE_W)
    wxv = wx[:, :TILE_W]
    w_col = jnp.where(src == cxv, 1.0 - wxv, 0.0) + jnp.where(src == cxv + 1, wxv, 0.0)

    cr = guide_blk[0]                         # (8, 128) each
    cg = guide_blk[1]
    cb = guide_blk[2]

    n_chunks = D // DC
    best0 = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    arg0 = jnp.zeros((TILE_H, TILE_W), jnp.int32)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            maps_hbm.at[
                :, pl.ds(c * DC, DC), pl.ds(r0, RS), pl.ds(c0, CS)
            ],
            slab.at[slot], sem.at[slot],
        )

    # double buffer: chunk c+1 streams in while chunk c computes — the
    # per-tile wall is max(DMA, compute), not their sum
    get_dma(0, 0).start()

    def chunk_body(c, carry):
        best, arg = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        get_dma(slot, c).wait()
        cur = slab[slot]
        # rows: contract RS — (8, RS) x (4, DC, RS, CS) -> (8, 4, DC, CS)
        # HIGHEST precision: the TPU MXU default truncates f32 operands to
        # bf16, which moves ~5% of knife-edge argmins vs the exact-f32 lerp
        # contract (measured via bench.py kernel_parity); HIGHEST keeps the
        # two weight-carrying taps f32-faithful
        rowed = jax.lax.dot_general(
            w_row, cur,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # cols: merge (maps, DC, rows) into the matmul M dimension —
        # batched M=8 matmuls run the MXU at 8/128 row utilization, one
        # (n_maps*DC*8, CS) @ (CS, TW) matmul runs it full
        flat = jnp.transpose(rowed, (1, 2, 0, 3)).reshape(
            n_maps * DC * TILE_H, CS
        )
        q4 = jnp.dot(flat, w_col, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        q4 = q4.reshape(n_maps, DC, TILE_H, TILE_W)
        # combine maps with the guide: (DC, 8, TW)
        q = (
            q4[0] * cr[None]
            + q4[1] * cg[None]
            + q4[2] * cb[None]
            + q4[3]
        )
        if mask_d0:
            d_glob = c * DC + jax.lax.broadcasted_iota(
                jnp.int32, (DC, 1, 1), 0
            )
            q = jnp.where(d_glob == 0, jnp.inf, q)
        c_min = jnp.min(q, axis=0)
        c_arg = (c * DC + jnp.argmin(q, axis=0)).astype(jnp.int32)
        take = c_min < best
        return jnp.where(take, c_min, best), jnp.where(take, c_arg, arg)

    best, arg = jax.lax.fori_loop(0, n_chunks, chunk_body, (best0, arg0))
    out_ref[:] = arg


# --- polyphase column variant ---------------------------------------------
# At exact integer column upscaling (W % w == 0, P = W // w phases) the
# bilinear column interpolation is PERIODIC: output column P*q + r lerps
# source columns (q + d_r, q + d_r + 1) with a per-phase weight, where
# d_r in {-1, 0}. The generic kernel spends its time on a (CS~256)-deep
# column matmul with only two weight-carrying rows; here the same values
# come from static lane slices of the row-interpolated slab (offsets
# margin-1 / margin / margin+1) plus per-phase lerps — pure VPU work, so
# the kernel goes from MXU-bound (~31 ms/view at 2K) to DMA-bound.
# Output is phase-major (P, H, ceil(W/P)), un-interleaved by XLA afterwards.
#
# QUASI-polyphase (W % w != 0, P = W // w >= 2): the source tap for output
# column P*q + r is q + e with a per-lane drift e in {-2, -1, 0} (the
# floor-index walk of the non-integer ratio; -2 also covers the right-edge
# sx clamp). Every Middlebury width hits this case (450 = 4*112 + 2,
# 463 = 4*115 + 3, 447 = 4*111 + 3): the same kernel then reads FOUR
# static windows (margin-2..margin+1) and picks the (a, b) tap pair per
# lane from an e-table packed in the wx block — still zero matmuls. The
# masked mode's tables come from the true `linear_coeffs` (clamps
# included), so it needs no XLA edge fixup; the exact-integer mode keeps
# the static per-phase slices (no selects) plus the ncl-column fixup.
#
# Layout contract: the maps tensor carries a `margin`-lane left margin
# (slice legality; values may be junk) and enough right padding that every
# slab window [j*TWQ - margin, j*TWQ + TWQ + margin) is in-bounds — the
# layout `poly_col_params` computes and kernels/lowmaps_pallas.py emits
# (out_wp/out_margin). Single-tile widths use the smallest margin M >= 2
# with (TWQ + 2M) a 128-multiple (the window starts at lane 0, so no
# alignment unit is needed); multi-tile widths keep margin = POLY_MARGIN
# = 128 so every window start j*TWQ - margin stays lane-aligned. Junk
# margin reads can only carry weight for the first P//2 output columns of
# the exact-static mode, which are recomputed exactly in XLA (masked mode
# never weights them: e >= -k at lane k).

POLY_MARGIN = 128
POLY_TILE_H = 32   # output rows per tile (tuned on v5e: 42.5 ms vs 44.7 at
                   # tile_h=16 for 2K/d=256; see sweep in the docstring)
POLY_TWQ_MAX = 768  # auto-tuned phase-column tile width search bound
_ROWMM_BATCHED = True  # batched (maps*DC) row-interp matmul emitting the
                       # (4, DC, TH, CS) layout directly (no transpose);
                       # False = single wide matmul + VMEM transpose


def poly_col_params(w: int, W: int, twq: int | None = None) -> dict | None:
    """Polyphase layout for logical low width w -> output width W, or None
    when neither the exact nor the quasi polyphase column path applies.
    `twq` overrides the phase-column tile width (multiple of 128); larger
    tiles amortize the 2*POLY_MARGIN slab-lane overhead per tile at the
    cost of VMEM. Returned dict: exact=True means the static per-phase
    slice mode is valid (W == P*w); the (wx, e) tables are always filled
    and drive the masked mode (valid for every accepted ratio)."""
    P = W // w
    if P <= 1 or P > 8:
        return None
    from primestereomatch_tpu.ops.resize import linear_coeffs as _lc

    wq = -(-W // P)                  # phase-column count (== w when exact)
    sxW, fxW = _lc(w, W)
    ks = np.arange(wq)
    e_tab = np.zeros((P, wq), np.int32)
    wx_tab = np.zeros((P, wq), np.float32)
    for r in range(P):
        j = np.minimum(P * ks + r, W - 1)
        e_tab[r] = sxW[j].astype(np.int64) - ks
        wx_tab[r] = fxW[j]
    if e_tab.min() < -2 or e_tab.max() > 0:
        return None                  # drift beyond the 4 static windows
    exact = W % w == 0
    if twq is not None:
        if twq % 128:
            raise ValueError(f"twq {twq} must be a multiple of 128")
        twq = min(twq, _round_up(wq, 128))
        ntxq = -(-wq // twq)
        cs = twq + 2 * POLY_MARGIN
    elif _round_up(wq, 8) <= POLY_TWQ_MAX:
        # SINGLE-TILE width: the slab window is [0, cs) (j == 0), so only
        # the kernel's static slice bounds constrain the window — trim the
        # RIGHT slack to the lane tile: cs = round_up(margin + twq + 2,
        # 128) instead of twq + 2*margin. The slab DMA, the row-interp
        # matmul N and the rowed/transpose volumes all scale with cs:
        # 2K 896 -> 768, HD720 640 -> 512, Teddy-quasi 512 -> 384 lanes.
        # The LEFT margin stays POLY_MARGIN = 128: the producers store
        # the data at that lane offset, and a non-128 store offset sends
        # Mosaic into a pathological retiling compile (measured: a
        # margin-44 lowmaps at 2K did not finish compiling in 15 min).
        twq = _round_up(wq, 8)
        ntxq = 1
        cs = _round_up(POLY_MARGIN + twq + 2, 128)
    else:
        # multi-tile: every tile's window start j*TWQ - margin must stay
        # 128-aligned, so twq and margin are 128-multiples; pick the
        # width minimizing total slab lanes ntxq*CS (then padded phase
        # columns ntxq*twq)
        twq = min(
            range(128, POLY_TWQ_MAX + 1, 128),
            key=lambda t: (-(-wq // t) * (t + 2 * POLY_MARGIN),
                           -(-wq // t) * t),
        )
        twq = min(twq, _round_up(wq, 128))
        ntxq = -(-wq // twq)
        cs = twq + 2 * POLY_MARGIN
    # maps width: margin + data, with every slab window in-bounds; the
    # out_wp data width is cs - margin for the single-tile case (always a
    # 128-multiple, so the producers' aligned-lane plans hold)
    wp = (ntxq - 1) * twq + cs - POLY_MARGIN
    deltas = tuple(
        int(np.floor((r + 0.5) / P - 0.5)) for r in range(P)
    )
    return {
        "P": P, "TWQ": twq, "ntxq": ntxq, "out_wp": wp, "cs": cs,
        "margin": POLY_MARGIN, "deltas": deltas, "ncl": P // 2,
        "wq": wq, "exact": exact, "e": e_tab, "wx": wx_tab,
    }


def _wta_kernel_poly(
    row_start_s,                    # SMEM (nty,) aligned slab row starts
    maps_hbm, guide_blk, ryw_blk, wx_blk, out_ref,
    slab, sem,
    *, D: int, DC: int, RS: int, CS: int, P: int, TWQ: int, TH: int,
    deltas: tuple, margin: int = POLY_MARGIN, masked: bool = False,
    mask_d0: bool = True,
    mm_precision=jax.lax.Precision.HIGHEST,
):
    # mask_d0=False drops the never-select-d0 inf mask (one compare +
    # select per (d, px) in EVERY chunk): the maps producers can poison
    # the d=0 slice instead (a_*=0, b=D0_POISON — lowmaps/cvc_lowmaps
    # poison_d0=True), which costs one tiny store in one grid cell there.
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = pl.multiple_of(row_start_s[i], 8)
    c0 = pl.multiple_of(j * TWQ, 128)

    # row-interpolation matrix (TH, RS) from the packed ry/fy table
    ry = ryw_blk[0, :, 0:1]
    wy = ryw_blk[0, :, 1:2]
    rr = jax.lax.broadcasted_iota(jnp.int32, (TH, RS), 1)
    ry_i = ry.astype(jnp.int32)
    w_row = jnp.where(rr == ry_i, 1.0 - wy, 0.0) + jnp.where(rr == ry_i + 1, wy, 0.0)

    n_chunks = D // DC
    best0 = jnp.full((P, TH, TWQ), jnp.inf, jnp.float32)
    arg0 = jnp.zeros((P, TH, TWQ), jnp.int32)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            maps_hbm.at[:, pl.ds(c * DC, DC), pl.ds(r0, RS), pl.ds(c0, CS)],
            slab.at[slot], sem.at[slot],
        )

    get_dma(0, 0).start()

    def chunk_body(c, carry):
        best, arg = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        get_dma(slot, c).wait()
        cur = slab[slot]                         # (4, DC, RS, CS)
        if _ROWMM_BATCHED:
            # BATCHED row-interp matmul: batch = (maps, DC), so the
            # result materializes directly as (4, DC, TH, CS) and the
            # (TH, 4, DC, CS) -> (4, DC, TH, CS) VMEM transpose (a full
            # relayout of the chunk, ~0.8 MB per step at 2K) disappears.
            # Bitwise-identical: each output element is the same 2-tap
            # 6-pass contraction. (An earlier transpose-free variant that
            # kept the (TH, ...) layout and re-sliced the map axis was
            # SLOWER, 54-62 vs 42 ms/view — the fix is changing the
            # matmul's output layout, not the phase loop's.)
            wr_b = jnp.broadcast_to(w_row, (4 * DC, TH, RS))
            rowed = jax.lax.dot_general(
                wr_b, cur.reshape(4 * DC, RS, CS),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=mm_precision,            # exact-f32 taps (see above)
            ).reshape(4, DC, TH, CS)
        else:
            rowed = jax.lax.dot_general(
                w_row, cur,
                dimension_numbers=(((1,), (2,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mm_precision,            # exact-f32 taps (see above)
            )                                      # (TH, 4, DC, CS)
            rowed = jnp.transpose(rowed, (1, 2, 0, 3))  # (4, DC, TH, CS)
        M = margin
        # the static source-lane windows every phase lerp draws from
        sA = rowed[..., M - 1 : M - 1 + TWQ]
        sB = rowed[..., M : M + TWQ]
        sC = rowed[..., M + 1 : M + 1 + TWQ]
        sZ = rowed[..., M - 2 : M - 2 + TWQ] if masked else None

        if mask_d0:
            d_glob = c * DC + jax.lax.broadcasted_iota(jnp.int32, (DC, 1, 1), 0)
        mins, args_ = [], []
        for r in range(P):
            wx = wx_blk[0, r, :][None, None, :]  # (1, 1, TWQ)

            # combine-then-lerp: q = lerp(sum_m a_m*g_m, sum_m b_m*g_m).
            # Algebraically equal to the per-map lerp-then-combine (the
            # generic kernel's order) but ~25% fewer VPU ops: the guide
            # combine collapses the 4 maps BEFORE the column lerp (and
            # before the masked tap selects, which distribute over the
            # elementwise combine since the drift e is per-lane, shared by
            # all maps). Rounding differs in the last ulp, so knife-edge
            # argmin ties may move vs the generic kernel (tie-tolerant
            # tests; bench.py kernel_parity bounds the drift on hardware).
            def comb(s4):
                return (
                    s4[0] * guide_blk[0, r]
                    + s4[1] * guide_blk[1, r]
                    + s4[2] * guide_blk[2, r]
                    + s4[3]
                )                                # (DC, TH, TWQ)

            if masked:
                # per-lane drift e in {-2, -1, 0} from the packed table:
                # tap pair (a, b) = (src[k+e], src[k+e+1])
                ei = wx_blk[0, 8 + r, :][None, None, :]
                mZ = ei <= -1.5
                mA = ei <= -0.5
                cz, ca, cb, cc = comb(sZ), comb(sA), comb(sB), comb(sC)
                a = jnp.where(mZ, cz, jnp.where(mA, ca, cb))
                b = jnp.where(mZ, ca, jnp.where(mA, cb, cc))
            else:
                a, b = (
                    (comb(sA), comb(sB)) if deltas[r] == -1
                    else (comb(sB), comb(sC))
                )
            q = a * (1.0 - wx) + b * wx          # (DC, TH, TWQ)
            if mask_d0:
                q = jnp.where(d_glob == 0, jnp.inf, q)
            mins.append(jnp.min(q, axis=0))
            args_.append((c * DC + jnp.argmin(q, axis=0)).astype(jnp.int32))
        c_min = jnp.stack(mins)                  # (P, TH, TWQ)
        c_arg = jnp.stack(args_)
        take = c_min < best
        return jnp.where(take, c_min, best), jnp.where(take, c_arg, arg)

    best, arg = jax.lax.fori_loop(0, n_chunks, chunk_body, (best0, arg0))
    out_ref[:] = arg


@functools.partial(jax.jit, static_argnames=("out_hw", "d_chunk", "interpret"))
def fgf_wta_pallas(
    guide: jax.Array,          # (H, W, 3) float32
    mean_a_r: jax.Array,       # (D, h, w) float32
    mean_a_g: jax.Array,
    mean_a_b: jax.Array,
    mean_b: jax.Array,
    out_hw: tuple[int, int],
    d_chunk: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """(H, W) uint8 WTA disparities (d=0 never selected). vmap-able: the
    batching rule maps frames sequentially (one pallas_call each — the
    kernel already pipelines its own DMA, so per-frame dispatch is the
    right batch strategy, see CLAUDE.md on vmap throughput)."""

    @jax.custom_batching.custom_vmap
    def run(g, a0, a1, a2, b):
        return _fgf_wta_pallas_impl(g, a0, a1, a2, b, out_hw, d_chunk, interpret)

    @run.def_vmap
    def _rule(axis_size, in_batched, g, a0, a1, a2, b):  # noqa: ANN001
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size, *x.shape))

        args = [bcast(x, bb) for x, bb in zip((g, a0, a1, a2, b), in_batched)]
        out = jax.lax.map(
            lambda xs: _fgf_wta_pallas_impl(*xs, out_hw, d_chunk, interpret),
            tuple(args),
        )
        return out, True

    return run(guide, mean_a_r, mean_a_g, mean_a_b, mean_b)


def fgf_wta_pallas_maps(
    guide: jax.Array,          # (H, W, 3) float32
    maps: jax.Array,           # (4, D, HP, WP) STACKED [a_r, a_g, a_b, b],
                               # finite junk outside the logical (h, w)
    logical_hw: tuple[int, int],
    out_hw: tuple[int, int],
    d_chunk: int = 32,
    poly: bool = False,        # polyphase column layout (see poly_col_params)
    tile_h: int | None = None,  # poly output rows per tile (None = default)
    poly_twq: int | None = None,  # poly phase-column tile width override
    mm_precision: str = "highest",  # row-interp matmul precision (poly path)
    mask_d0: bool = True,      # False iff the producer poisoned maps[:, 0]
    maps_layout: str = "auto",  # "poly" | "plain" | "auto" (width inference)
    interpret: bool = False,
) -> jax.Array:
    """WTA from a pre-stacked, pre-padded maps tensor (the layout
    kernels/lowmaps_pallas.py emits) — skips the (4, D, h, w) stack+pad
    copy of the tuple entry point (~700 MB per view at 2K/d=256).
    With poly=True the maps must be in the polyphase layout (left margin +
    out_wp lanes; pass lowmaps out_wp/out_margin from poly_col_params
    called with the SAME poly_twq). mask_d0=False skips the in-kernel
    d==0 inf mask — only valid when the maps producer ran with
    poison_d0=True (lowmaps/cvc_lowmaps write a_*=0, b=D0_POISON at d=0,
    so d=0 loses every argmin without per-chunk masking work).

    vmap-able: the batching rule FOLDS the frames into the row-tile grid
    axis (one fgf_wta_pallas_maps_batched launch for the whole batch;
    the (B, 4, D, HPf, WPm) -> (4, D, B*HPf, WPm) relayout is the only
    extra copy)."""

    @jax.custom_batching.custom_vmap
    def run(g, m):
        return _fgf_wta_pallas_impl(
            g, m, out_hw=out_hw, d_chunk=d_chunk, interpret=interpret,
            logical_hw=logical_hw, poly=poly, tile_h=tile_h,
            poly_twq=poly_twq, mm_precision=mm_precision, mask_d0=mask_d0,
            maps_layout=maps_layout,
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, g, m):  # noqa: ANN001
        if mm_precision != "highest":
            raise NotImplementedError(
                "vmap of fgf_wta_pallas_maps supports mm_precision='highest'"
            )
        gb, mb = in_batched

        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size, *x.shape))

        g = bcast(g, gb)
        m = bcast(m, mb)
        B, n4, D, HPf, WPm = m.shape
        mf = jnp.moveaxis(m, 0, 2).reshape(n4, D, B * HPf, WPm)
        out = fgf_wta_pallas_maps_batched(
            g, mf, logical_hw, out_hw, d_chunk=d_chunk, poly=poly,
            tile_h=tile_h, poly_twq=poly_twq, mask_d0=mask_d0,
            maps_layout=maps_layout, interpret=interpret,
        )
        return out, True

    return run(guide, maps)


@functools.partial(
    jax.jit,
    static_argnames=(
        "logical_hw", "out_hw", "d_chunk", "poly", "tile_h", "poly_twq",
        "mask_d0", "maps_layout", "interpret",
    ),
)
def fgf_wta_pallas_maps_batched(
    guide: jax.Array,          # (B, H, W, 3) float32
    maps: jax.Array,           # (4, D, B*HPf, WPm) folded maps — the layout
                               # fgf_low_maps_pallas_batched emits
    logical_hw: tuple[int, int],
    out_hw: tuple[int, int],
    d_chunk: int = 32,
    poly: bool = False,        # polyphase column layout (see poly_col_params)
    tile_h: int | None = None,
    poly_twq: int | None = None,
    mask_d0: bool = True,      # False iff the producer poisoned maps[:, 0]
    maps_layout: str = "auto",  # "poly" | "plain" | "auto" (width inference)
    interpret: bool = False,
) -> jax.Array:
    """Batch-folded WTA — see _fgf_wta_pallas_maps_batched_impl for the
    mechanics. vmap-able: the batching rule folds the vmap axis into the
    existing frame fold (one launch for Bv*B frames)."""

    @jax.custom_batching.custom_vmap
    def run(g, m):
        return _fgf_wta_pallas_maps_batched_impl(
            g, m, logical_hw, out_hw, d_chunk, poly, tile_h, poly_twq,
            mask_d0, maps_layout, interpret,
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, g, m):  # noqa: ANN001
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size, *x.shape))

        g = bcast(g, in_batched[0])
        m = bcast(m, in_batched[1])
        Bv, B = g.shape[0], g.shape[1]
        gf = g.reshape(Bv * B, *g.shape[2:])
        n4, D = m.shape[1], m.shape[2]
        mf = jnp.moveaxis(m, 0, 2).reshape(n4, D, -1, m.shape[-1])
        out = _fgf_wta_pallas_maps_batched_impl(
            gf, mf, logical_hw, out_hw, d_chunk, poly, tile_h, poly_twq,
            mask_d0, maps_layout, interpret,
        )
        return out.reshape(Bv, B, *out.shape[1:]), True

    return run(guide, maps)


def _fgf_wta_pallas_maps_batched_impl(
    guide, maps, logical_hw, out_hw, d_chunk, poly, tile_h, poly_twq,
    mask_d0, maps_layout, interpret,
):
    """Batch-folded WTA: ONE pallas_call for the whole batch. Frame b's
    row tiles are grid rows b*nty..(b+1)*nty-1 and its slab row starts
    carry the b*HPf offset, so the kernel and block specs are identical to
    the single-frame launch. poly=True selects the polyphase column
    variant (static per-phase slices + batched XLA edge fixup at exact
    integer ratios, masked per-lane tap tables at quasi ratios); the maps
    must then be in the poly layout (lowmaps out_wp/out_margin from
    poly_col_params). Returns (B, H, W) uint8 disparities."""
    B, H, W = guide.shape[0], *out_hw
    h, w = logical_hw
    D = maps.shape[1]
    if poly:
        pp = poly_col_params(w, W, twq=poly_twq)
        if pp is None:
            raise ValueError(f"polyphase WTA does not apply to {w}->{W}")
        DCp = min(d_chunk, D)
        if D % DCp:
            raise ValueError(f"D={D} not divisible by chunk {DCp}")
        return _wta_poly_run(guide, maps, h, w, out_hw, DCp, pp, interpret,
                             tile_h=tile_h, mask_d0=mask_d0,
                             maps_layout=maps_layout)
    DC = min(d_chunk, D)
    if D % DC:
        raise ValueError(f"D={D} not divisible by chunk {DC}")
    if maps.shape[2] % B:
        raise ValueError("maps rows not divisible by batch")
    HPf = maps.shape[2] // B
    WPm = maps.shape[3]

    tw = _pick_tile_w(W)
    hp = _round_up(H, TILE_H)
    wp = _round_up(W, tw)
    nty, ntx = hp // TILE_H, wp // tw

    sy, fy = linear_coeffs(h, H)
    sx, fx = linear_coeffs(w, W)
    sy = np.concatenate([sy, np.full(hp - H, sy[-1])])
    fy = np.concatenate([fy, np.full(hp - H, fy[-1], np.float32)])
    sx = np.concatenate([sx, np.full(wp - W, sx[-1])])
    fx = np.concatenate([fx, np.full(wp - W, fx[-1], np.float32)])

    span_r = int((sy[np.minimum(np.arange(nty) * TILE_H + TILE_H - 1, hp - 1)]
                  - (sy[np.arange(nty) * TILE_H] // 8) * 8).max()) + 2
    RS = _round_up(8 + span_r, 8)
    row_start = ((sy[np.arange(nty) * TILE_H] // 8) * 8).astype(np.int32)
    col_base = (sx[np.arange(ntx) * tw] // 128) * 128
    span_c = int((sx[np.minimum(np.arange(ntx) * tw + tw - 1, wp - 1)]
                  - col_base).max()) + 2
    CS = _round_up(span_c, 128)
    col_start = col_base.astype(np.int32)
    DC = _gen_plan_dc(D, DC, RS, CS, tw) if not interpret else DC

    if not (HPf >= h and RS <= HPf and CS <= WPm):
        raise ValueError(
            f"maps frame layout ({HPf}, {WPm}) too small for the aligned "
            f"slab windows (RS={RS}, CS={CS}) — feed the pre-padded "
            "fgf_low_maps_pallas_batched output"
        )
    # clamp per-frame, then offset to frame b's row block: windows never
    # cross frames, and clamped reads stay weight-0-exact (see the
    # single-frame path's proof)
    row_start = np.minimum(row_start, HPf - RS).astype(np.int32)
    col_start = np.minimum(col_start, WPm - CS).astype(np.int32)
    ry_rel = (sy - np.repeat(row_start, TILE_H)).astype(np.float32)
    cx_rel = (sx - np.repeat(col_start, tw)).astype(np.float32)
    row_start_b = (
        np.tile(row_start, B)
        + np.repeat(np.arange(B, dtype=np.int32) * HPf, nty)
    ).astype(np.int32)

    guide_p = jnp.moveaxis(guide, -1, 1)                    # (B, 3, H, W)
    guide_p = jnp.pad(guide_p, ((0, 0), (0, 0), (0, hp - H), (0, wp - W)))
    guide_p = jnp.transpose(guide_p, (1, 0, 2, 3)).reshape(3, B * hp, wp)

    ryw = np.zeros((nty, TILE_H, tw), np.float32)
    ryw[:, :, 0] = ry_rel.reshape(nty, TILE_H)
    ryw[:, :, 1] = fy.reshape(nty, TILE_H)
    ryw = np.tile(ryw, (B, 1, 1))
    CW = max(CS, tw)
    cxw = np.zeros((ntx, 16, CW), np.float32)
    cxw[:, 0, :tw] = cx_rel.reshape(ntx, tw)
    cxw[:, 1, :tw] = fx.reshape(ntx, tw)

    kernel = functools.partial(
        _wta_kernel, n_maps=4, D=D, DC=DC, RS=RS, CS=CS, TILE_W=tw,
        mask_d0=mask_d0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                       # maps
            pl.BlockSpec((3, TILE_H, tw), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((1, TILE_H, tw), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 16, CW), lambda i, j, *_: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_H, tw), lambda i, j, *_: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, 4, DC, RS, CS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * hp, wp), jnp.int32),
        interpret=interpret,
    )(
        jnp.asarray(row_start_b), jnp.asarray(col_start),
        maps, guide_p, jnp.asarray(ryw), jnp.asarray(cxw),
    )
    return out.reshape(B, hp, wp)[:, :H, :W].astype(jnp.uint8)


def _poly_plan_dc(D: int, dc_req: int, RS: int, CS: int, TH: int,
                  TWQ: int, P: int, budget: int = 12 << 20) -> int:
    """Largest disparity chunk (divisor of D, <= dc_req) whose VMEM
    footprint fits the budget. The dominant live buffers per chunk step:
    double-buffered slab (2,4,DC,RS,CS) f32, ONE row-interp result
    (TH*4*DC*CS f32 — the batched matmul emits the target layout
    directly, no transpose copy since _ROWMM_BATCHED), and the per-phase
    lerp temporaries (~5 x DC*TH*TWQ) f32; ~1.5 MB of fixed blocks
    (guide/tables/out/acc). Without this cap the HD720/2K shapes exceed
    the ~16 MB/core VMEM and the TPU compile fails with a
    stack-allocation OOM."""
    # NOTE: the batched row-matmul removed the transpose copy, but the
    # 2x rowed-buffer term STAYS: relaxing it to 1x bumped Teddy's chunk
    # to DC=8 and that kernel reproducibly crashed the relay's compile
    # helper (HTTP 500 on every attempt) — the conservative term is
    # load-bearing headroom for Mosaic's actual stack, not just the copy
    fixed = (3 * P * TH * TWQ + TH * 128 + 8 * TWQ          # guide/ryw/wx
             + 3 * P * TH * TWQ) * 4 + (P * TH * TWQ) * 4   # best/arg/out
    for dc in range(min(dc_req, D), 0, -1):
        if D % dc:
            continue
        use = (2 * 4 * dc * RS * CS + 2 * TH * 4 * dc * CS
               + 5 * dc * TH * TWQ) * 4 + fixed
        if use <= budget:
            return dc
    return 1


def _wta_poly_run(guide, maps, h, w, out_hw, DC, pp, interpret, tile_h=None,
                  mm_precision="highest", mask_d0=True,
                  maps_layout="auto"):
    """Single-frame OR batch-folded polyphase WTA launch.

    guide (H, W, 3) + maps (4, D, HPf, WPm) run one frame; guide
    (B, H, W, 3) + maps (4, D, B*HPf, WPm) fold the batch onto the
    row-tile grid axis (one pallas_call, same kernel — the per-tile slab
    row starts carry the b*HPf offset, exactly like the generic batched
    launch). Returns (H, W) / (B, H, W) uint8.

    Mode: exact ratios (single-frame AND batched) keep the static
    per-phase slices + ncl-column XLA fixup — 2 guide combines per
    (d, px) instead of the masked mode's 4 combines + 4 tap selects.
    Quasi ratios use the masked per-lane tap select, whose (wx, e)
    tables are the true linear_coeffs values everywhere (clamped edges
    included) — no fixup needed."""
    H, W = out_hw
    P, TWQ, ntxq, wq = pp["P"], pp["TWQ"], pp["ntxq"], pp["wq"]
    margin, deltas, ncl = pp["margin"], pp["deltas"], pp["ncl"]
    batched = guide.ndim == 4
    B = guide.shape[0] if batched else 1
    if not batched:
        guide = guide[None]
    masked = not pp["exact"]
    D = maps.shape[1]
    wq_p = ntxq * TWQ
    CS = pp["cs"]
    want_w = margin + pp["out_wp"]

    if not masked:
        # periodicity sanity: the static in-kernel slices assume
        # sx[P*k + r] == k + deltas[r] away from the clamped edges
        sxW, _ = linear_coeffs(w, W)
        ks = np.arange(1, w - 1)
        for r in range(P):
            if not np.array_equal(sxW[P * ks + r], ks + deltas[r]):
                raise ValueError(f"column scale {w}->{W} is not phase-periodic")

    def _row_plan(TH_c):
        hp_c = _round_up(H, TH_c)
        nty_c = hp_c // TH_c
        sy_, fy_ = linear_coeffs(h, H)
        sy_ = np.concatenate([sy_, np.full(hp_c - H, sy_[-1])])
        fy_ = np.concatenate([fy_, np.full(hp_c - H, fy_[-1], np.float32)])
        span = int((sy_[np.minimum(np.arange(nty_c) * TH_c + TH_c - 1, hp_c - 1)]
                    - (sy_[np.arange(nty_c) * TH_c] // 8) * 8).max()) + 2
        RS_c = _round_up(8 + span, 8)
        rs0 = ((sy_[np.arange(nty_c) * TH_c] // 8) * 8).astype(np.int32)
        return hp_c, nty_c, sy_, fy_, RS_c, rs0

    if tile_h is not None:
        TH = tile_h
    elif interpret:
        TH = POLY_TILE_H
    else:
        # per-grid-step launch/DMA-wait latency dominates at small sizes:
        # pick the tile height minimizing total sequential (cell x chunk)
        # steps under the VMEM plan (2K keeps 32, Teddy-size picks 128)
        def _steps(TH_c):
            _, nty_c, _, _, RS_c, _ = _row_plan(TH_c)
            DC_c = _poly_plan_dc(D, DC, RS_c, CS, TH_c, TWQ, P)
            return (nty_c * ntxq * (D // DC_c), TH_c)

        TH = min((32, 64, 128), key=_steps)

    hp, nty, sy, fy, RS, row_start = _row_plan(TH)
    DC = _poly_plan_dc(D, DC, RS, CS, TH, TWQ, P) if not interpret else DC

    HPt, WPm = maps.shape[2], maps.shape[3]
    if HPt % B:
        raise ValueError("maps rows not divisible by batch")
    HPm = HPt // B                                    # rows per frame
    # layout: with tight single-tile margins a PLAIN maps width can
    # coincide with the poly width, so callers that know their layout say
    # so ("poly" = lowmaps out_wp/out_margin output, "plain" = data at
    # lane 0); "auto" keeps the legacy width inference
    if maps_layout == "poly" and WPm != want_w:
        raise ValueError(
            f"poly-layout maps are {WPm} lanes wide, expected {want_w}"
        )
    if maps_layout == "plain" or (maps_layout == "auto" and WPm != want_w):
        # plain-layout maps (tuple entry): bring into the poly layout
        maps = jnp.pad(
            maps,
            ((0, 0), (0, 0), (0, 0), (margin, max(0, want_w - WPm - margin))),
        )[..., :want_w]
        WPm = maps.shape[3]
    need_h = int(row_start.max()) + RS
    if HPm < need_h and (HPm % 8 != 0 or HPm < RS):
        # clamping (below) is exact whenever the frame rows stay 8-aligned
        # (the multiple_of-8 DMA hint must hold for the clamped starts) and
        # a full slab window fits: all weight-carrying rows sy..sy+1 <= h-1
        # (linear_coeffs zeroes the +1 tap at the edge) < HPm stay covered.
        # The lowmaps layout (HP = n_tiles*32) always qualifies — this pad
        # only fires for hand-fed odd-row maps. (An unconditional pad here
        # cost 2 x 3.6 ms of pure HBM copy at 2K/d=256.)
        if batched:
            # per-frame padding is impossible post-fold
            raise ValueError(
                f"maps frame rows {HPm} unusable (need 8-aligned >= {RS}) — "
                "feed the pre-padded lowmaps batched output"
            )
        maps = jnp.pad(maps, ((0, 0), (0, 0), (0, need_h - HPm), (0, 0)))
        HPm = need_h
    row_start = np.minimum(row_start, HPm - RS).astype(np.int32)
    ry_rel = (sy - np.repeat(row_start, TH)).astype(np.float32)
    row_start_b = (
        np.tile(row_start, B)
        + np.repeat(np.arange(B, dtype=np.int32) * HPm, nty)
    ).astype(np.int32)

    ryw = np.zeros((nty, TH, 128), np.float32)
    ryw[:, :, 0] = ry_rel.reshape(nty, TH)
    ryw[:, :, 1] = fy.reshape(nty, TH)
    ryw = np.tile(ryw, (B, 1, 1))

    # packed per-tile wx/e tables: rows 0..P-1 hold the lerp weights,
    # rows 8..8+P-1 the per-lane drift e (floats; padding lanes get the
    # clamped last-column values, outputs there are sliced off)
    wxe = np.zeros((ntxq, 16, TWQ), np.float32)
    ks_p = np.arange(wq_p)
    sxW, fxW = linear_coeffs(w, W)
    for r in range(P):
        j = np.minimum(P * ks_p + r, W - 1)
        wxe[:, r, :] = fxW[j].reshape(ntxq, TWQ)
        e_r = np.clip(sxW[j].astype(np.int64) - ks_p, -2, 0)
        wxe[:, 8 + r, :] = e_r.reshape(ntxq, TWQ).astype(np.float32)

    # guide in phase-major column layout (3, P, B*hp, wq_p); columns pad
    # to wq*P first (quasi widths are not P-divisible)
    gp = jnp.moveaxis(guide, -1, 1)                       # (B, 3, H, W)
    gp = jnp.pad(gp, ((0, 0), (0, 0), (0, hp - H), (0, wq * P - W)))
    gp = gp.reshape(B, 3, hp, wq, P)
    gp = jnp.transpose(gp, (1, 4, 0, 2, 3)).reshape(3, P, B * hp, wq)
    gp = jnp.pad(gp, ((0, 0), (0, 0), (0, 0), (0, wq_p - wq)))

    kernel = functools.partial(
        _wta_kernel_poly, D=D, DC=DC, RS=RS, CS=CS, P=P, TWQ=TWQ, TH=TH,
        deltas=deltas, margin=margin, masked=masked, mask_d0=mask_d0,
        # Mosaic supports only HIGHEST (6-pass f32) and DEFAULT (bf16) dots
        mm_precision={"highest": jax.lax.Precision.HIGHEST,
                      "default": jax.lax.Precision.DEFAULT}[mm_precision],
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * nty, ntxq),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                        # maps
            pl.BlockSpec((3, P, TH, TWQ), lambda i, j, *_: (0, 0, i, j)),
            pl.BlockSpec((1, TH, 128), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 16, TWQ), lambda i, j, *_: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((P, TH, TWQ), lambda i, j, *_: (0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, 4, DC, RS, CS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, B * hp, wq_p), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(row_start_b), maps, gp, jnp.asarray(ryw), jnp.asarray(wxe))

    out = out.reshape(P, B, hp, wq_p)
    disp = jnp.transpose(out[:, :, :H, :wq], (1, 2, 3, 0))
    disp = disp.reshape(B, H, wq * P)[:, :, :W]

    if not masked:
        # left-edge fixup (exact-static mode only): output cols J < ncl
        # have clamped source col 0 but the static phase slices read the
        # (junk) margin — recompute them exactly (same two-term lerps and
        # combine order as the kernel), vectorized over the B frames
        col0 = maps[:, :, :, margin].reshape(4, D, B, HPm)
        sy_j = jnp.asarray(sy[:H])
        fy_j = jnp.asarray(fy[:H])
        r0v = jnp.take(col0, sy_j, axis=-1)
        r1v = jnp.take(col0, jnp.minimum(sy_j + 1, HPm - 1), axis=-1)
        qm = r0v * (1.0 - fy_j) + r1v * fy_j            # (4, D, B, H)
        d_mask = (jnp.arange(D) == 0)[:, None, None]
        for J in range(ncl):
            g = guide[:, :H, J, :]                      # (B, H, 3)
            qJ = (
                qm[0] * g[..., 0][None]
                + qm[1] * g[..., 1][None]
                + qm[2] * g[..., 2][None]
                + qm[3]
            )                                           # (D, B, H)
            qJ = jnp.where(d_mask, jnp.inf, qJ)
            dJ = jnp.argmin(qJ, axis=0).astype(jnp.int32)
            disp = disp.at[:, :, J].set(dJ)
    disp = disp.astype(jnp.uint8)
    return disp if batched else disp[0]


def _fgf_wta_pallas_impl(
    guide, mean_a_r, mean_a_g=None, mean_a_b=None, mean_b=None,
    out_hw=None, d_chunk=32, interpret=False, logical_hw=None, poly=False,
    tile_h=None, poly_twq=None, mm_precision="highest", mask_d0=True,
    maps_layout="auto",
) -> jax.Array:
    if mean_b is not None:
        maps = jnp.stack([mean_a_r, mean_a_g, mean_a_b, mean_b], axis=0)
        h, w = mean_b.shape[-2:]
        maps_layout = "plain"    # freshly stacked: data at lane 0
    else:
        maps = mean_a_r          # pre-stacked (4, D, HP, WP)
        h, w = logical_hw
    H, W = out_hw
    D = maps.shape[1]
    DC = min(d_chunk, D)
    if D % DC:
        raise ValueError(f"D={D} not divisible by chunk {DC}")
    if poly:
        pp = poly_col_params(w, W, twq=poly_twq)
        if pp is None:
            raise ValueError(f"polyphase WTA does not apply to {w}->{W}")
        return _wta_poly_run(guide, maps, h, w, out_hw, DC, pp, interpret,
                             tile_h=tile_h, mm_precision=mm_precision,
                             mask_d0=mask_d0, maps_layout=maps_layout)
    tw = _pick_tile_w(W)
    hp = _round_up(H, TILE_H)
    wp = _round_up(W, tw)
    nty, ntx = hp // TILE_H, wp // tw

    sy, fy = linear_coeffs(h, H)
    sx, fx = linear_coeffs(w, W)
    # pad coeff tables to the padded output size (clamped repeats)
    sy = np.concatenate([sy, np.full(hp - H, sy[-1])])
    fy = np.concatenate([fy, np.full(hp - H, fy[-1], np.float32)])
    sx = np.concatenate([sx, np.full(wp - W, sx[-1])])
    fx = np.concatenate([fx, np.full(wp - W, fx[-1], np.float32)])

    # per-tile aligned slab starts + residual-relative indices
    span_r = int((sy[np.minimum(np.arange(nty) * TILE_H + TILE_H - 1, hp - 1)]
                  - (sy[np.arange(nty) * TILE_H] // 8) * 8).max()) + 2
    RS = _round_up(8 + span_r, 8)
    row_start = ((sy[np.arange(nty) * TILE_H] // 8) * 8).astype(np.int32)

    col_base = (sx[np.arange(ntx) * tw] // 128) * 128
    span_c = int((sx[np.minimum(np.arange(ntx) * tw + tw - 1, wp - 1)]
                  - col_base).max()) + 2
    CS = _round_up(span_c, 128)
    col_start = col_base.astype(np.int32)
    DC = _gen_plan_dc(D, DC, RS, CS, tw) if not interpret else DC

    hpad = int(row_start.max()) + RS
    wpad = int(col_start.max()) + CS
    HPm, WPm = maps.shape[2], maps.shape[3]
    if HPm >= h and RS <= HPm and CS <= WPm:
        # pre-padded maps: clamp every aligned window in-bounds instead of
        # re-padding. A clamped window always covers all weight-carrying
        # rows/cols (relative index <= size-1 by construction); reads past
        # sy+1/cx+1 only ever multiply by the 0.0 weight the clamped coeff
        # tables produce, and the padded region is finite (never inf/NaN),
        # so 0.0 * junk contributes exactly 0 to the banded matmul.
        row_start = np.minimum(row_start, HPm - RS).astype(np.int32)
        col_start = np.minimum(col_start, WPm - CS).astype(np.int32)
    else:
        maps = jnp.pad(
            maps,
            ((0, 0), (0, 0), (0, max(hpad - HPm, 0)), (0, max(wpad - WPm, 0))),
        )
    ry_rel = (sy - np.repeat(row_start, TILE_H)).astype(np.float32)
    cx_rel = (sx - np.repeat(col_start, tw)).astype(np.float32)

    guide_p = jnp.pad(
        jnp.moveaxis(guide, -1, 0), ((0, 0), (0, hp - H), (0, wp - W))
    )

    # packed per-tile tables (blocked VMEM inputs)
    ryw = np.zeros((nty, TILE_H, tw), np.float32)
    ryw[:, :, 0] = ry_rel.reshape(nty, TILE_H)
    ryw[:, :, 1] = fy.reshape(nty, TILE_H)
    CW = max(CS, tw)
    cxw = np.zeros((ntx, 16, CW), np.float32)
    cxw[:, 0, :tw] = cx_rel.reshape(ntx, tw)
    cxw[:, 1, :tw] = fx.reshape(ntx, tw)

    kernel = functools.partial(
        _wta_kernel, n_maps=4, D=D, DC=DC, RS=RS, CS=CS, TILE_W=tw,
        mask_d0=mask_d0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                       # maps
            pl.BlockSpec((3, TILE_H, tw), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((1, TILE_H, tw), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 16, CW), lambda i, j, *_: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_H, tw), lambda i, j, *_: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, 4, DC, RS, CS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        interpret=interpret,
    )(
        jnp.asarray(row_start), jnp.asarray(col_start),
        maps, guide_p, jnp.asarray(ryw), jnp.asarray(cxw),
    )
    return out[:H, :W].astype(jnp.uint8)
