"""Pallas TPU kernel: fused CVC + low-resolution FGF coefficient chain.

At exact-stride column sampling (W % w == 0 — the 2K / HD720 / ZED
configs) the sampled cost volume of ops/cost_volume.py::
build_cost_volumes_sampled is, per disparity d = s*q + r, a fused
slice+FMA over s small "polyphase planes" of the other view. The XLA
formulation still materializes the (D, h, w) volume (~175 MB/view at
2K/d=256) and lowers to ~D separate loop fusions whose per-dispatch
overhead dominates (measured ~14.8 ms/frame at 2K while the pure HBM
traffic is ~4 ms) — reference dataflow being replaced:
src/CVC.cpp:122-179 producing the volume consumed by
src/CVF_cl.cpp:226-281.

This kernel computes the cost block IN VMEM from the tiny polyphase
planes and immediately runs the fgf_low_maps box/solve/box chain of
kernels/lowmaps_pallas.py on it — the cost volume never exists in HBM
and the XLA slice-fusion overhead disappears. Layout/output contract is
identical to fgf_low_maps_pallas (STACKED (4, D, HP, WT) maps in the WTA
kernel's padded layout).

Key design points:

  * grid = (row tiles, D // s): each chunk covers the s disparities
    d = c*s + j sharing ONE whole-pixel shift q = c, so the polyphase
    plane r = j is a STATIC channel index and the shift is one dynamic
    lane slice `pl.ds(off, WI)` of the planes block (off = qmax - c for
    the left view, c for the right — src/CVC.cpp:151-163 directions).
  * rows: cost is row-local, so the reflect-101 row margins the box
    chain needs are PRE-REFLECTED on the small inputs in XLA (commutes).
  * columns: reflect does NOT commute with the disparity shift, so the
    kernel computes the cost on the full padded lane domain and then
    overwrites the 2*M margin lanes with the exact reflect-101 copies of
    the interior cost (cost_pad[-t] = cost[t]) — bitwise what
    jnp.pad(cost, mode='reflect') produces.
  * masks/border: the border cost (other-view operands = BC,
    src/CVC.cpp:30-39) is computed in-kernel from the sampled local
    view; the x >= d / x < W-d validity masks use a reflected global-x
    coordinate channel so margin lanes get the reflected mask too.

Numerics: the cost expression is the same left-associated float chain as
ops/cost_volume.py::_pair_cost and the maps chain is shared code
(_maps_chain) — bitwise-equal to
fgf_low_maps_pallas(build_cost_volumes_sampled(...)) in interpret mode
(tests/test_kernels.py::test_cvc_lowmaps_fused_matches_composition).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from primestereomatch_tpu.kernels.lowmaps_pallas import (
    _box_valid,  # noqa: F401  (re-export for kernel tests)
    _maps_chain,
    _round_up,
)
from primestereomatch_tpu.ops.guided_filter import _color_inverse_cov


def _cvc_lowmaps_kernel(
    planes_blk,   # (1, 4*s, TI, WB) other-view polyphase planes [b,g,r,grad]*s
    stat_blk,     # (1, 12, TI, WI)  ch_low(3) means(3) inv(6)
    view_blk,     # (1, 5, TI, WI)   sampled local view [b, g, r, grad, x]
    out_ref,      # (4, s, TH, margin+WO)
    p_scr,        # VMEM scratch (s, TI, WI) f32 — the in-VMEM cost block
    *, k: int, s: int, M: int, w: int, W: int, qmax: int,
    alpha: float, border_cost: float,
    tau1: float | None, tau2: float | None,
    is_left: bool, margin: int = 0, poison_d0: bool = False,
):
    c = pl.program_id(1)
    off = (qmax - c) if is_left else c
    WI = stat_blk.shape[3]

    ls0 = view_blk[0, 0]
    ls1 = view_blk[0, 1]
    ls2 = view_blk[0, 2]
    lg = view_blk[0, 3]
    xs = view_blk[0, 4]

    # Mosaic cannot lane-slice at a dynamic non-128-multiple offset, so the
    # per-chunk whole-pixel shift is ONE dynamic lane rotate of the planes
    # block; WB >= qmax + WI guarantees the consumed lanes never wrap.
    # The shift must be NON-NEGATIVE: Mosaic miscompiles negative dynamic
    # rotate amounts when the lane count is a non-power-of-two number of
    # vregs (measured: roll(x, -1) on 384/896 lanes reads lane 129/641;
    # 256 lanes is correct) — left-roll by `off` == right-roll by WB - off.
    from jax.experimental.pallas import tpu as pltpu

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
        p_scr[j] = jnp.where(mask, cost, border)

    # column reflect-101 margins: cost_pad[:, M-1-t] = cost[:, M+1+t] and
    # cost_pad[:, M+w+t] = cost[:, M+w-2-t] — exactly jnp.pad(mode='reflect')
    for t in range(M):
        p_scr[:, :, M - 1 - t] = p_scr[:, :, M + 1 + t]
        p_scr[:, :, M + w + t] = p_scr[:, :, M + w - 2 - t]

    _maps_chain(p_scr[...], stat_blk, out_ref, k=k, DC=s, margin=margin,
                poison_d0=poison_d0)


def _plan_th(s: int, M: int, WI: int, WB: int, WT: int,
             budget: int = 12 << 20) -> int | None:
    """Largest output-rows-per-tile whose VMEM footprint fits. Model:
    double-buffered planes block, stats/view counted once, ~9 DC-sized
    chain intermediates live at the peak of _maps_chain. CAUTION on the
    budget: the ISOLATED 2K TH=32 kernel compiles (12.56 vs 14.10
    ms/view, bitwise equal) but the SAME kernel inside the full
    stereo_gif_forward program OOMs Mosaic's scoped stack at 19.19M —
    the stack depends on the operands' producer layouts, so the planner
    must stay conservative (2K keeps TH=16; HD720-class fits TH=32).
    Re-attempt only with a per-call tile_h override plus an in-pipeline
    compile check."""
    lane = lambda x: _round_up(x, 128)  # noqa: E731
    for th in (32, 16, 8):
        ti = th + 2 * M
        use = 4 * (
            2 * (4 * s * ti * lane(WB))
            + (12 + 5) * ti * lane(WI)
            + 2 * 4 * s * th * lane(WT)
            + 9 * s * ti * lane(WI)
        )
        if use <= budget:
            return th
    return None


def cvc_lowmaps_applicable(
    W: int, w: int, xi, max_dis: int, subsample: int,
    radius: int = 8, out_wp: int | None = None, out_margin: int = 0,
) -> bool:
    """True when the fused CVC+lowmaps kernel covers this geometry: exact
    column stride (the polyphase-plane condition of
    build_cost_volumes_sampled), s | D so every chunk shares one q, and a
    VMEM plan exists."""
    xi = np.asarray(xi)
    s = subsample
    if len(xi) == 0 or W % len(xi) or W // len(xi) != s:
        return False
    if not np.array_equal(xi, np.arange(len(xi)) * s):
        return False
    if max_dis < s or max_dis % s:
        return False
    k = 2 * (radius // subsample) + 1
    M = 2 * (k // 2)
    WP = _round_up(len(xi), 128)
    if out_wp is not None:
        WP = max(len(xi), out_wp)
    WI = WP + 2 * M
    WB = max_dis // s - 1 + WP + 2 * M
    return _plan_th(s, M, WI, WB, out_margin + WP) is not None


def cvc_fgf_low_maps_pallas(
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
    out_wp: int | None = None,
    out_margin: int = 0,
    alpha: float = 0.9,
    border_cost: float = 1.0,
    tau1: float | None = None,
    tau2: float | None = None,
    tile_h: int | None = None,   # override the VMEM-planned rows per tile
    poison_d0: bool = False,     # a_*=0, b=D0_POISON at d=0 (WTA mask_d0=False)
    interpret: bool = False,
) -> jax.Array:
    """Fused build_cost_volumes_sampled (one view) + fgf_low_maps: returns
    the STACKED maps (4, D, HP, margin+WP) in fgf_wta_pallas_maps's layout
    (identical contract to fgf_low_maps_pallas). The (D, h, w) cost volume
    never exists in HBM. Exact-stride columns only — check
    `cvc_lowmaps_applicable` first.

    vmap-able: frames dispatch sequentially (jax.lax.map — the per-frame
    kernel already saturates the chip; see CLAUDE.md on vmap strategy)."""
    @jax.custom_batching.custom_vmap
    def run(a, ag, b, bg):
        return _cvc_fgf_low_maps_impl(
            a, ag, b, bg, is_left, max_dis, yi, xi, radius, eps, subsample,
            out_wp, out_margin, alpha, border_cost, tau1, tau2, tile_h,
            poison_d0, interpret,
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, a, ag, b, bg):  # noqa: ANN001
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size, *x.shape))

        args = [bcast(x, bb) for x, bb in zip((a, ag, b, bg), in_batched)]
        out = jax.lax.map(
            lambda xs: _cvc_fgf_low_maps_impl(
                *xs, is_left, max_dis, yi, xi, radius, eps, subsample,
                out_wp, out_margin, alpha, border_cost, tau1, tau2, tile_h,
                poison_d0, interpret,
            ),
            tuple(args),
        )
        return out, True

    return run(img, grd, other_img, other_grd)


def _cvc_fgf_low_maps_impl(
    img, grd, other_img, other_grd, is_left, max_dis, yi, xi, radius, eps,
    subsample, out_wp, out_margin, alpha, border_cost, tau1, tau2, tile_h,
    poison_d0, interpret,
):
    H, W, _ = img.shape
    yi = np.asarray(yi)
    xi = np.asarray(xi)
    h, w = len(yi), len(xi)
    s = subsample
    D = max_dis
    if W % w or W // w != s or not np.array_equal(xi, np.arange(w) * s):
        raise ValueError("fused CVC+lowmaps needs exact-stride columns")
    if D % s:
        raise ValueError(f"max_dis {D} not divisible by subsample {s}")
    qmax = D // s - 1
    k = 2 * (radius // subsample) + 1
    M = 2 * (k // 2)

    TH = tile_h if tile_h is not None else (32 if interpret else None)
    n_tiles_probe = -(-h // 32)
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
    WI = WP + 2 * M
    # lane-aligned so the in-kernel dynamic rotate has an aligned shape
    WB = _round_up(qmax + WP + 2 * M, 128)
    WT = out_margin + WP
    if TH is None:
        TH = _plan_th(s, M, WI, WB, WT)
        if TH is None:
            raise ValueError("fused CVC+lowmaps VMEM plan failed for this shape")
    n_tiles = -(-h // TH)
    HP = n_tiles * TH
    TI = TH + 2 * M

    # ---- sampled local view + polyphase planes of the other view ----------
    a_rows = img[yi]                      # (h, W, 3)
    ag_rows = grd[yi]
    b_rows = other_img[yi]
    bg_rows = other_grd[yi]
    a_s = a_rows[:, xi]                   # (h, w, 3)
    ag_s = ag_rows[:, xi]

    b4 = jnp.concatenate([b_rows, bg_rows[..., None]], axis=-1)
    b4 = b4.reshape(h, w, s, 4)           # b4[:, j, r] = other col s*j + r
    if is_left:
        # left cost at col s*j, disparity d = s*q + r samples other col
        # s*j - d = s*(j - q) - r: r = 0 -> plane[j - q] of phase 0;
        # r > 0 -> plane[j - q - 1] of phase s - r (ops/cost_volume.py:170-178)
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
        # right cost samples other col s*j + d = s*(j + q) + r
        planes = [
            jnp.pad(b4[:, :, r], ((0, 0), (0, qmax), (0, 0))) for r in range(s)
        ]
    planes = jnp.stack(planes)                        # (s, h, qmax+w, 4)
    planes = jnp.moveaxis(planes, -1, 1).reshape(4 * s, h, qmax + w)

    # ---- low-res guide statistics (identical to fgf_low_maps_pallas) ------
    ch_low = tuple(a_s[..., ci] for ci in range(3))   # == resize_nearest(guide)
    means, inv = _color_inverse_cov(ch_low, k, eps)
    stats = jnp.stack([*ch_low, *means, *inv], axis=0)          # (12, h, w)

    xs_f = jnp.broadcast_to(
        jnp.asarray(xi, jnp.float32)[None, :], (h, w)
    )
    view5 = jnp.stack(
        [a_s[..., 0], a_s[..., 1], a_s[..., 2], ag_s, xs_f], axis=0
    )                                                           # (5, h, w)

    # ---- padding ----------------------------------------------------------
    extra_r = HP - h

    def pad_rows(x):
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(M, M), (0, 0)],
                    mode="reflect")
        if extra_r:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, extra_r), (0, 0)],
                        mode="edge")
        return x

    # stats/view: reflect-101 cols then edge-extend to WI (junk cols are
    # finite and only feed junk outputs >= w)
    def pad_cols_reflect(x, to):
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(M, M)], mode="reflect")
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])],
                       mode="edge")

    stats_p = pad_rows(pad_cols_reflect(stats, WI))
    view_p = pad_rows(pad_cols_reflect(view5, WI))
    # planes: data at lane offset M so every in-kernel window
    # [off, off + WI) is in-bounds for off in [0, qmax]; edge fill is junk
    # the margin-overwrite / junk-column contract never consumes
    planes_p = pad_rows(
        jnp.pad(
            jnp.pad(planes, ((0, 0), (0, 0), (M, 0)), mode="edge"),
            ((0, 0), (0, 0), (0, WB - (qmax + w + M))), mode="edge",
        )
    )

    def tile_rows(x, C):
        return jnp.stack(
            [jax.lax.slice_in_dim(x, i * TH, i * TH + TI, axis=-2)
             for i in range(n_tiles)], axis=0,
        )  # (n_tiles, C, TI, ·)

    p_tiles = tile_rows(planes_p, 4 * s)
    s_tiles = tile_rows(stats_p, 12)
    v_tiles = tile_rows(view_p, 5)

    kernel = functools.partial(
        _cvc_lowmaps_kernel, k=k, s=s, M=M, w=w, W=W, qmax=qmax,
        alpha=alpha, border_cost=border_cost, tau1=tau1, tau2=tau2,
        is_left=is_left, margin=out_margin, poison_d0=poison_d0,
    )
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, D // s),
        in_specs=[
            pl.BlockSpec((1, 4 * s, TI, WB), lambda i, c: (i, 0, 0, 0)),
            pl.BlockSpec((1, 12, TI, WI), lambda i, c: (i, 0, 0, 0)),
            pl.BlockSpec((1, 5, TI, WI), lambda i, c: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((4, s, TH, WT), lambda i, c: (0, c, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, D, HP, WT), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s, TI, WI), jnp.float32)],
        interpret=interpret,
    )(p_tiles, s_tiles, v_tiles)
    return out
