"""Pallas TPU kernel: fused low-resolution FastGuidedFilter coefficient chain.

The FGF's low-res half (ops/guided_filter.py::fgf_low_maps, reference
src/fastguidedfilter.cpp:121-198 + src/CVF_cl.cpp:226-281 dataflow) is, per
cost slice: box(p), box(I_c*p) x3, the 3x3-inverse-covariance solve for
(a_r, a_g, a_b, b), then box(a_c) x3 + box(b). In XLA that is ~8 separable
box passes whose intermediates each round-trip HBM — ~12 (D, h, w) tensor
passes. This kernel runs the entire chain per (row-tile, d-chunk) block in
VMEM: one read of the cost block, one write of the four coefficient maps.

Layout contract (designed to feed kernels/wta_pallas.py directly):

  * inputs are pre-padded in XLA with the reflect-101 margins the two box
    passes need (M = 2*(k//2) rows/cols each side) and pre-expanded into
    overlapping row tiles (n_tiles, D, TH+2M, w+2M) — so every in-kernel
    slice is static and the kernel is pure VALID box math (no edge logic);
  * the output is the STACKED maps tensor (4, D, HP, WP) with
    HP = n_tiles*TH >= h and WP = round_up(w, 128) — exactly the padded
    layout fgf_wta_pallas_maps DMAs from (it clamps its aligned windows
    in-bounds), so the maps never get re-padded (at 2K that jnp.pad alone
    copies ~700 MB per view). Rows >= h / cols >= w hold finite junk the
    WTA consumer only ever reads with 0.0 interpolation weight.

Numerics: the box sums are sequential 5-tap (k-tap) adds; the XLA path's
reduce_window may sum the same window in a different order, so agreement
with ops/guided_filter.py is exact-valued up to last-ulp float summation
(the same contract as the WTA/WMF kernels; %BP goldens are unaffected).

STATUS: equal to fgf_low_maps within 2e-6 in interpret mode (exact window
multisets); on a v5e the fused chain replaces ~45 ms of XLA box passes at
2K/d=256 (see BENCH_SUITE.json / SCALING.md).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from primestereomatch_tpu.ops.guided_filter import _color_inverse_cov

TH = 32  # output rows per tile
DC_CAP = 4  # max disparity slices per grid step (tuning hook; auto-shrunk)

# d=0 poison value (see poison_d0): q(0) = 0*I + D0_POISON dwarfs every
# real filtered cost (O(1) values), so the WTA argmin can skip its
# per-chunk d==0 inf mask (wta_pallas mask_d0=False). Far below the f32
# max so the WTA's interpolation matmuls/lerps can never overflow it.
D0_POISON = 1.0e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _box_valid(x: jax.Array, k: int, scale: float) -> jax.Array:
    """k x k VALID mean over the last two axes via sequential tap adds."""
    m = k - 1
    R, C = x.shape[-2], x.shape[-1]
    r = jax.lax.slice_in_dim(x, 0, R - m, axis=-2)
    for i in range(1, k):
        r = r + jax.lax.slice_in_dim(x, i, R - m + i, axis=-2)
    c = jax.lax.slice_in_dim(r, 0, C - m, axis=-1)
    for i in range(1, k):
        c = c + jax.lax.slice_in_dim(r, i, C - m + i, axis=-1)
    return c * scale


def _maps_chain(
    p,            # (DC, TI, WI)  cost block values (pre-padded tile)
    stat_blk,     # (1, 12, TI, WI)  ch_low(3) means(3) inv(6), same tile
    out_ref,      # (4, DC, TH, margin+WO)  [a_r, a_g, a_b, b] box-averaged
    *, k: int, DC: int, margin: int = 0, poison_d0: bool = False,
):
    # WI = WO + 2M: the box output is naturally full block width, so no
    # in-kernel concat/pad is ever needed (Mosaic rejects lane-dim concats
    # of mismatched layouts). Columns beyond the logical w are finite junk
    # the WTA consumer only reads with 0.0 weight.
    m1 = k // 2
    inv_k2 = 1.0 / (k * k)
    TI = p.shape[1]
    WI = p.shape[2]

    ch = stat_blk[0, 0:3]                       # (3, TI, WI)
    # stats are consumed at the mid domain (TH+2*m1, WO+2*m1)
    mid_r = (m1, TI - m1)
    mid_c = (m1, WI - m1)
    mean_r = stat_blk[0, 3:6, mid_r[0]:mid_r[1], mid_c[0]:mid_c[1]]
    inv6 = stat_blk[0, 6:12, mid_r[0]:mid_r[1], mid_c[0]:mid_c[1]]

    mp = _box_valid(p, k, inv_k2)                # (DC, TI-2m1, WI-2m1)
    mIp = [
        _box_valid(ch[c][None] * p, k, inv_k2) for c in range(3)
    ]
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
    # per-map stores keep the VMEM live set small (a jnp.stack would hold
    # all four boxed maps plus the stacked copy at once)
    for i, t in enumerate((a_r, a_g, a_b, b)):
        boxed = _box_valid(t, k, inv_k2)
        if margin:
            # polyphase WTA layout: data at lane offset `margin`, margin
            # lanes zero-filled (slab-slice legality padding; the consumer
            # recomputes any weight-carrying margin read in XLA)
            out_ref[i, :, :, :margin] = jnp.zeros(
                (DC, boxed.shape[-2], margin), jnp.float32
            )
            out_ref[i, :, :, margin:] = boxed
        else:
            out_ref[i] = boxed
    if poison_d0:
        # overwrite the d=0 maps (never-selected disparity) so the WTA
        # consumer can run with mask_d0=False: a_* = 0, b = D0_POISON.
        # Grid dim 1 is the disparity-chunk axis in both callers
        # (lowmaps: n_dc chunks of DC; cvc_lowmaps: D//s chunks of s), so
        # d == 0 is exactly (program_id(1) == 0, local slice 0).
        @pl.when(pl.program_id(1) == 0)
        def _():
            rows, cols = out_ref.shape[2], out_ref.shape[3]
            for i in range(3):
                out_ref[i, 0] = jnp.zeros((rows, cols), jnp.float32)
            out_ref[3, 0] = jnp.full((rows, cols), D0_POISON, jnp.float32)


def _lowmaps_kernel(
    p_blk,        # (1, DC, TI, WI)  cost block (pre-padded tile)
    stat_blk,     # (1, 12, TI, WI)  ch_low(3) means(3) inv(6), same tile
    out_ref,      # (4, DC, TH, margin+WO)  [a_r, a_g, a_b, b] box-averaged
    *, k: int, DC: int, margin: int = 0, poison_d0: bool = False,
):
    _maps_chain(p_blk[0], stat_blk, out_ref, k=k, DC=DC, margin=margin,
                poison_d0=poison_d0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "eps", "subsample", "out_wp", "out_margin", "poison_d0",
        "interpret",
    ),
)
def fgf_low_maps_pallas(
    guide: jax.Array,          # (H, W, 3) float32 full-res guide
    p_low: jax.Array,          # (D, h, w) subsampled cost volume
    radius: int = 8,
    eps: float = 1e-4,
    subsample: int = 4,
    out_wp: int | None = None,  # pad output lanes to at least this (WTA layout)
    out_margin: int = 0,        # left lane margin (polyphase WTA layout)
    poison_d0: bool = False,    # write a_*=0, b=D0_POISON at d=0 (WTA mask_d0=False)
    interpret: bool = False,
) -> jax.Array:
    """Fused fgf_low_maps: returns STACKED maps (4, D, HP, margin+WP) f32
    ([mean_a_r, mean_a_g, mean_a_b, mean_b]) where HP = ceil(h/TH)*TH,
    WP = max(round_up(w, 128), out_wp applied exactly), data at lane
    `out_margin` (margin lanes are zeros); outside (h, w) is finite junk.
    Feed directly to fgf_wta_pallas_maps(..., logical_hw=(h, w)).
    vmap-able: frames dispatch sequentially (see kernels/wta_pallas.py)."""

    @jax.custom_batching.custom_vmap
    def run(g, p):
        return _fgf_low_maps_pallas_impl(
            g, p, radius, eps, subsample, out_wp, out_margin, poison_d0,
            interpret
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, g, p):  # noqa: ANN001
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size, *x.shape))

        g, p = (bcast(x, bb) for x, bb in zip((g, p), in_batched))
        # one folded pallas_call (frames on the tile grid axis), then split
        # the stacked rows back into the per-frame (4, D, HP, WT) layout
        out = _fgf_low_maps_pallas_impl(
            g, p, radius, eps, subsample, out_wp, out_margin, poison_d0,
            interpret
        )
        n4, D, BHP, WT = out.shape
        out = out.reshape(n4, D, axis_size, BHP // axis_size, WT)
        return jnp.moveaxis(out, 2, 0), True

    return run(guide, p_low)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "eps", "subsample", "out_wp", "out_margin", "poison_d0",
        "interpret",
    ),
)
def fgf_low_maps_pallas_batched(
    guide: jax.Array,          # (B, H, W, 3) float32 full-res guides
    p_low: jax.Array,          # (B, D, h, w) subsampled cost volumes
    radius: int = 8,
    eps: float = 1e-4,
    subsample: int = 4,
    out_wp: int | None = None,
    out_margin: int = 0,
    poison_d0: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Batch-folded fgf_low_maps_pallas: ONE pallas_call for the whole
    batch. Frames fold into the row-tile grid axis (tiles of frame b are
    grid rows b*n_tiles..(b+1)*n_tiles-1), so the kernel and block specs
    are identical to the single-frame launch. Returns (4, D, B*HP, WT) —
    frame b's maps live at rows [b*HP, (b+1)*HP), the exact layout
    fgf_wta_pallas_maps_batched consumes (row starts carry the b*HP
    offset). Replaces the lax.map-over-frames dispatch whose per-frame
    kernel launches dominate small-image batch throughput (CLAUDE.md).

    vmap-able: the batching rule folds the vmap axis into the existing
    frame fold (one launch for Bv*B frames)."""

    @jax.custom_batching.custom_vmap
    def run(g, p):
        return _fgf_low_maps_pallas_impl(
            g, p, radius, eps, subsample, out_wp, out_margin, poison_d0,
            interpret
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, g, p):  # noqa: ANN001
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size, *x.shape))

        g, p = (bcast(x, bb) for x, bb in zip((g, p), in_batched))
        Bv = axis_size
        out = _fgf_low_maps_pallas_impl(
            g.reshape(Bv * g.shape[1], *g.shape[2:]),
            p.reshape(Bv * p.shape[1], *p.shape[2:]),
            radius, eps, subsample, out_wp, out_margin, poison_d0, interpret,
        )
        n4, D, BHP, WT = out.shape
        out = out.reshape(n4, D, Bv, BHP // Bv, WT)
        return jnp.moveaxis(out, 2, 0), True

    return run(guide, p_low)


def _fgf_low_maps_pallas_impl(
    guide, p_low, radius, eps, subsample, out_wp, out_margin, poison_d0,
    interpret
) -> jax.Array:
    from primestereomatch_tpu.ops.resize import resize_nearest

    batched = p_low.ndim == 4
    B = p_low.shape[0] if batched else 1
    if not batched:
        guide = guide[None]
        p_low = p_low[None]
    D, h, w = p_low.shape[1:]
    k = 2 * (radius // subsample) + 1
    M = 2 * (k // 2)
    n_tiles = -(-h // TH)
    HP = n_tiles * TH
    WP = _round_up(w, 128)
    if out_wp is not None:
        # the poly WTA layout may be NARROWER than the 128-rounded width
        # (tight single-tile margins, see wta_pallas.poly_col_params) —
        # honour it exactly so the consumer never re-pads the maps
        if out_wp % 128:
            raise ValueError(
                f"out_wp {out_wp} must be lane-aligned (multiple of 128); "
                "a misaligned maps layout breaks the WTA slab windows"
            )
        WP = max(w, out_wp)
    # WI = WP + 2M: the in-kernel VALID box output is then naturally WP
    # lanes wide (no lane-dim concat, which Mosaic rejects)
    WI = WP + 2 * M
    TI = TH + 2 * M
    WT = out_margin + WP
    # VMEM plan: per-block working set is the double-buffered p/stat/out
    # blocks plus ~10 DC-sized intermediates of the box/solve chain (mp,
    # mIp x3, cov x3, a_* and their box slices). The lane dim is padded to
    # 128 in VMEM. Shrink DC until the estimate fits ~12 MB of the ~16 MB
    # core VMEM (at 2K/d=256 the poly-layout WT=1024 lanes overflow DC=4).
    lane = lambda x: _round_up(x, 128)  # noqa: E731
    DC = min(DC_CAP, D)
    while D % DC:
        DC //= 2
    while DC > 1:
        use = 4 * (
            2 * DC * TI * lane(WI) + 2 * 12 * TI * lane(WI)
            + 2 * 4 * DC * TH * lane(WT) + 10 * DC * TI * lane(WI)
        )
        if use <= (12 << 20):
            break
        DC //= 2
    n_dc = D // DC

    # ---- low-res guide statistics in XLA (small: 12 (h, w) planes) --------
    ch_low = tuple(resize_nearest(guide[..., c], (h, w)) for c in range(3))
    means, inv = _color_inverse_cov(ch_low, k, eps)
    stats = jnp.stack([*ch_low, *means, *inv], axis=1)     # (B, 12, h, w)

    # ---- pad: reflect-101 margins (box semantics), then zero/edge fill ----
    def pad_hw(x, extra_rows, extra_cols, mode_extra):
        x = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 2) + [(M, M), (M, M)],
            mode="reflect",
        )
        if extra_rows or extra_cols:
            x = jnp.pad(
                x,
                [(0, 0)] * (x.ndim - 2) + [(0, extra_rows), (0, extra_cols)],
                mode=mode_extra,
            )
        return x

    extra_r = HP - h
    extra_c = WP - w
    p_pad = pad_hw(p_low, extra_r, extra_c, "constant")  # garbage -> finite 0s
    stats_pad = pad_hw(stats, extra_r, extra_c, "edge")  # keep inv/det finite

    # ---- overlapping row tiles (static concat; fused with the producer) ---
    # frames fold into the tile axis: tile (b, i) -> grid row b*n_tiles + i
    p_tiles = jnp.stack(
        [jax.lax.slice_in_dim(p_pad, i * TH, i * TH + TI, axis=-2)
         for i in range(n_tiles)], axis=1,
    ).reshape(B * n_tiles, D, TI, p_pad.shape[-1])  # (B*n_tiles, D, TI, WI)
    s_tiles = jnp.stack(
        [jax.lax.slice_in_dim(stats_pad, i * TH, i * TH + TI, axis=-2)
         for i in range(n_tiles)], axis=1,
    ).reshape(B * n_tiles, 12, TI, stats_pad.shape[-1])

    kernel = functools.partial(_lowmaps_kernel, k=k, DC=DC, margin=out_margin,
                               poison_d0=poison_d0)
    WT = out_margin + WP
    out = pl.pallas_call(
        kernel,
        grid=(B * n_tiles, n_dc),
        in_specs=[
            pl.BlockSpec((1, DC, TI, WI), lambda i, c: (i, c, 0, 0)),
            pl.BlockSpec((1, 12, TI, WI), lambda i, c: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((4, DC, TH, WT), lambda i, c: (0, c, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, D, B * HP, WT), jnp.float32),
        interpret=interpret,
    )(p_tiles, s_tiles)
    return out
