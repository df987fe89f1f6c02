"""Pallas TPU kernel for the SGBM directional DP aggregation.

The XLA formulation (`ops/sgbm.py::_dp_line_stack`) is a `lax.scan` whose
per-step state is a full image line — correct, but each of the ~H+W
sequential steps pays XLA loop overhead (dynamic-update-slice of the
emitted plane in HBM, carry repacking), which dominates SGBM wall-clock
on TPU (CLAUDE.md round-2 lever). This kernel runs the same recurrence
with the carry RESIDENT IN VMEM across a sequential 1-D grid:

  * grid = (T/R,): TPU grid steps execute in order, so a VMEM scratch
    carries (L, implicitly min_d L) from step to step; Pallas
    double-buffers the per-step cost planes and output stores
    automatically via the BlockSpec index maps.
  * R scan rows ride each grid step (static in-kernel loop): the
    sequential DMA/grid overhead is paid T/R times instead of T while
    the recurrence math is unchanged. T is zero-padded up to R|T —
    a zero cost row maps the all-zero initial carry to itself (L' =
    0 + best - minL = 0), so reversed lanes that consume the padding
    FIRST enter the real rows with the exact initial state, and forward
    lanes only ever write padding rows that are sliced off.
  * both scan orientations ride ONE kernel launch: the backward lanes
    read the SAME cost tensor through a second operand whose block index
    map runs t -> Tb-1-t (rows consumed in reverse inside the block),
    and write through an output mapped the same way — no materialized
    flipped copies anywhere (the XLA path stacks a flipped volume:
    2.8 GB at 2K/d=256). When the blocks + carry do not fit VMEM
    (~16 MB/core) the launch auto-splits into forward/backward halves.
  * layout is (T, D, N): D on sublanes (d+-1 penalty shifts are sublane
    rolls, min over d a sublane reduce), the line axis N on lanes
    (diagonal shears are lane rolls with a zero shifted in at the
    global edge — `_dp_line_stack` semantics, L=0/minL=0 outside).
  * when the static cost bound allows (l_bound = cost_bound + p2 <
    2**15), the carry, cost blocks and emitted sums are all 16-bit —
    half the VMEM footprint and HBM traffic. The arithmetic itself runs
    int32 (this Mosaic toolchain has no int16 reductions or sublane
    rotates); narrowing is exact because L <= l_bound by induction
    (best - minL <= p2) and group sums of 3 nonneg lanes stay < 2**16.

Semantics are EXACTLY `ops/sgbm.py::_dp_line_stack` (oracle
tests/oracle_sgbm.py; interpret-mode equality in tests/test_kernels.py).
Reference context: the reference delegates SGBM to cv::StereoSGBM
(src/StereoMatch.cpp:639-660); this is the aggregation loop of
Hirschmuller's algorithm, not a translation of OpenCV SIMD code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(1 << 28)
# single-launch VMEM budget: double-buffered in/out blocks + carry must
# stay under the ~16 MB/core VMEM (leave headroom for Mosaic temporaries)
_VMEM_BUDGET = 12 * 1024 * 1024
# test/tuning hook: force the rows-per-step choice (None = auto by budget)
_FORCE_R = None
# bt cost kernel tile shape (tuning hooks; see bt_block_cost_pallas).
# v5e 2K/d=256 sweep: (TH=16, DC=32) 33.5 ms wall, (32, 32) 34.0,
# (32, 16) 34.2 — the halo-recompute saving of taller tiles loses to
# their VMEM pressure; the kernel's cost is the per-d roll + BT math +
# window sums, not grid-step overhead
_BT_TH = 16
_BT_DC = 32


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _roll(x, sh: int, axis: int):
    # pltpu.roll requires a non-negative shift; a left-roll by 1 is a
    # right-roll by size-1
    if sh < 0:
        sh += x.shape[axis]
    return pltpu.roll(x, sh, axis=axis)


def _sgbm_scan_kernel(
    *refs,
    shifts: tuple,
    lane_op: tuple,            # operand index per lane
    lane_rev: tuple,           # True = lane consumes its block reversed
    groups: tuple,             # (lane_indices, out_index, reversed) per group
    p1: int, p2: int,
    n_valid: int, Dp: int, Np: int, R: int,
    n_in: int,
    n_adds: int = 0,           # extra operands summed into group outputs
    group_add: tuple = (),     # per group: add-operand index or None
    out_dtype=None,
    math_dtype=None,
    acc_dtype=None,
):
    """math_dtype int16 keeps the carry, loads and stores on narrow
    vectors (half the VMEM footprint — the enabling constraint for
    single-launch 2K); the rolls and the min-reduce run through int32
    because this Mosaic toolchain implements neither int16 reductions
    nor int16 sublane rotates. The caller guarantees
    l_bound < 2**15 so no narrowed value can wrap (L <= l_bound by
    induction: best - minL <= p2). Group sums accumulate lane-by-lane in
    acc_dtype (uint16 when 3 * l_bound < 2**16 — exact) so at most one
    extra plane per output group is ever live."""
    c_refs = refs[:n_in]
    add_refs = refs[n_in:n_in + n_adds]
    out_refs = refs[n_in + n_adds:n_in + n_adds + len(groups)]
    L_ref = refs[n_in + n_adds + len(groups)]

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        L_ref[:] = jnp.zeros_like(L_ref)

    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    sub_ix = jax.lax.broadcasted_iota(jnp.int32, (Dp, 1), 0)
    big = jnp.int32(_BIG)
    # masks are loop-invariant: build once, reuse across rows and lanes
    m_first_lane = lane_ix >= 1                  # (1, Np)
    m_last_lane = lane_ix < n_valid - 1
    m_sub_lo = jnp.broadcast_to(sub_ix >= 1, (Dp, Np))
    m_sub_hi = jnp.broadcast_to(sub_ix < Dp - 1, (Dp, Np))
    p1_ = jnp.int32(p1)
    p2_ = jnp.int32(p2)

    # lane index -> (group tuple, position in group) for on-the-fly sums
    lane_group = {}
    for lanes, oi, rev in groups:
        for j, i in enumerate(lanes):
            lane_group[i] = (lanes, oi, rev, j)

    squeezed_in = R == 1 and c_refs and c_refs[0].ndim == 2
    for ri in range(R):
        accs = [None] * len(groups)
        for si, sh in enumerate(shifts):
            Lp = L_ref[si].astype(jnp.int32)
            minLp = jnp.min(Lp, axis=0, keepdims=True)        # (1, Np)
            if sh == 1:
                # shear: lane i <- lane i-1, zero shifted in at the edge
                Lp = jnp.where(m_first_lane, _roll(Lp, 1, axis=1), 0)
                minLp = jnp.where(m_first_lane, _roll(minLp, 1, axis=1), 0)
            elif sh == -1:
                # lane i <- lane i+1; the lane entering at the global edge
                # (and all padding) becomes zero
                Lp = jnp.where(m_last_lane, _roll(Lp, -1, axis=1), 0)
                minLp = jnp.where(m_last_lane, _roll(minLp, -1, axis=1), 0)
            # masked entries never win: Lp <= l_bound < big + p1 is
            # always a candidate of `best`
            d_lo = jnp.where(m_sub_lo, _roll(Lp, 1, axis=0), big)
            d_hi = jnp.where(m_sub_hi, _roll(Lp, -1, axis=0), big)
            best = jnp.minimum(
                jnp.minimum(Lp, jnp.minimum(d_lo, d_hi) + p1_), minLp + p2_
            )
            # reversed lanes consume their block's rows back-to-front
            row = R - 1 - ri if lane_rev[si] else ri
            if squeezed_in:
                # (Dp, None, Np) squeezed blocks: the operand is the
                # (Dp, T, Np) cost consumed DIRECTLY (one row per step,
                # R == 1) — no (T, Dp, Np) transpose copy ever existed
                c = c_refs[lane_op[si]][...].astype(jnp.int32)
            else:
                c = c_refs[lane_op[si]][row].astype(jnp.int32)
            L = c + best - minLp
            L_ref[si] = L.astype(math_dtype)
            lanes, oi, rev, j = lane_group[si]
            a = L.astype(acc_dtype)
            accs[oi] = a if j == 0 else accs[oi] + a
            if j == len(lanes) - 1:
                row_o = R - 1 - ri if rev else ri
                val = accs[oi]
                if group_add and group_add[oi] is not None:
                    # fold a prior launch's partial into this store (the
                    # split fwd/bwd x-scan pair sum rides the bwd launch —
                    # no standalone XLA add+re-read of two full volumes)
                    val = val.astype(acc_dtype) + add_refs[group_add[oi]][
                        row_o
                    ].astype(acc_dtype)
                out_refs[oi][row_o] = val.astype(out_dtype)
                accs[oi] = None


def _plan_bytes(R, Dp, Np, n_in, n_out, in_size, out_size, n_lanes, carry_size):
    blocks = 2 * R * Dp * Np * (n_in * in_size + n_out * out_size)
    # ~8 int32 (Dp, Np) planes stay live through the lane loop (Lp and its
    # two d+-1 rolls, minLp, best, L, the widened cost block row, plus the
    # s16->s32 cast copies Mosaic materializes) — without this term the
    # HD720/d=128 merged launch planned R=2 and Mosaic's actual stack hit
    # 16.38M > 16M. Calibrated so that plan: the R=2 model (9.8M with a
    # 4-plane term) must exceed the 12M budget while 2K keeps its working
    # split R=1 fallback
    temps = 8 * Dp * Np * 4
    return blocks + n_lanes * Dp * Np * carry_size + temps


def _best_plan_r(Dp, Np, n_in, n_out, n_lanes, in_size, out_size, carry_size,
                 n_adds=0):
    """Largest rows-per-step R whose VMEM plan fits the budget, or None
    when even R=1 overflows (the launch must then split fwd/bwd).
    Shared by sgbm_scan_pallas's launch plan and by
    sgbm_aggregate_partials_pallas's merged-launch probe so the two sites
    can never diverge (a divergence would make the guarded
    "group_adds launches cannot split fwd/bwd" error reachable)."""
    if _FORCE_R is not None:
        return _FORCE_R
    for r in (8, 4, 2, 1):
        if _plan_bytes(r, Dp, Np, n_in + n_adds, n_out, in_size,
                       out_size, n_lanes, carry_size) <= _VMEM_BUDGET:
            return r
    return None


def sgbm_scan_pallas(
    cost_tdn: jax.Array,       # (T, Dp, Np) int16/int32 cost, padded
    p1: int, p2: int,
    shifts: tuple,             # lateral shift per lane (0 / +1 / -1)
    lane_dir: tuple,           # per lane: False = forward t, True = reversed
    groups: tuple,             # tuple of (lane_indices, reversed) output groups
    n_valid: int,              # logical line length (<= Np)
    out_dtype=jnp.uint16,
    math_dtype=jnp.int32,      # carry/storage dtype (compute is int32)
    acc_dtype=jnp.int32,       # in-kernel group-sum dtype
    group_adds: tuple | None = None,  # per group: tensor summed into the
                               # output (natural orientation, rows >= T),
                               # or None — single-orientation launches only
    in_layout: str = "tdn",    # "tdn" (T, Dp, Np) | "dtn" (Dp, T, Np):
                               # the cost consumed DIRECTLY in its
                               # (D, H, W) producer layout via squeezed
                               # (Dp, None, Np) blocks — forces R = 1
    interpret: bool = False,
):
    """Run all lanes over the T axis in one launch (or two when VMEM
    demands — see `_plan`). Forward lanes read step t, reversed lanes
    read step T-1-t (same array, second operand — no flipped copy).
    Each group emits sum(L over its lanes) as its own (T, Dp, Np)
    output; groups marked reversed are written back in natural
    orientation (their index map reverses too). Returns a tuple of
    group outputs ordered as `groups`."""
    if in_layout == "dtn":
        Dp, T, Np = cost_tdn.shape
    else:
        T, Dp, Np = cost_tdn.shape
    in_size = cost_tdn.dtype.itemsize
    out_size = jnp.dtype(out_dtype).itemsize
    carry_size = jnp.dtype(math_dtype).itemsize
    adds = tuple(group_adds or (None,) * len(groups))
    n_adds = sum(a is not None for a in adds)

    # --- launch plan: largest R fitting the budget; split fwd/bwd if not -
    def best_r(n_in, n_out, n_lanes):
        return _best_plan_r(Dp, Np, n_in, n_out, n_lanes, in_size,
                            out_size, carry_size, n_adds=n_adds)

    # one operand per scan orientation actually used (a split bwd-only
    # launch must not stream a dead forward copy of the cost)
    used_dirs = sorted(set(lane_dir))
    n_in = len(used_dirs)
    op_ix = {d_: i for i, d_ in enumerate(used_dirs)}
    R = best_r(n_in, len(groups), len(shifts))
    if in_layout == "dtn" and R is not None:
        R = 1                     # squeezed blocks carry one row per step
    if R is None and n_in == 2:
        if n_adds:
            raise ValueError("group_adds launches cannot split fwd/bwd")
        # split into forward-only and backward-only launches; each output
        # group must then be pure fwd or pure bwd (true for every caller:
        # groups mirror the scan orientation)
        outs = [None] * len(groups)
        for want in (False, True):
            l_sel = [i for i, d_ in enumerate(lane_dir) if d_ == want]
            if not l_sel:
                continue
            remap = {g: i for i, g in enumerate(l_sel)}
            sub_groups = []
            pos = []
            for gi, (lanes, rev) in enumerate(groups):
                if all(i in remap for i in lanes):
                    sub_groups.append((tuple(remap[i] for i in lanes), rev))
                    pos.append(gi)
                elif any(i in remap for i in lanes):
                    raise ValueError("mixed fwd/bwd output group cannot split")
            sub = sgbm_scan_pallas(
                cost_tdn, p1, p2,
                tuple(shifts[i] for i in l_sel),
                tuple(lane_dir[i] for i in l_sel),
                tuple(sub_groups), n_valid,
                out_dtype=out_dtype, math_dtype=math_dtype,
                acc_dtype=acc_dtype, in_layout=in_layout,
                interpret=interpret,
            )
            for gi, o in zip(pos, sub):
                outs[gi] = o
        return tuple(outs)
    if R is None:
        R = 1  # single-orientation launch too big: let Mosaic try anyway

    # --- zero-pad T to a multiple of R (see module docstring) -------------
    Tp = _round_up(T, R)
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0)) if in_layout == "dtn" else (
            (0, Tp - T), (0, 0), (0, 0)
        )
        cost_tdn = jnp.pad(cost_tdn, pad)
    Tb = Tp // R

    lane_op = tuple(op_ix[d_] for d_ in lane_dir)

    in_specs = []
    operands = []
    if in_layout == "dtn":
        # FREE bitcast (row-major minor-dims collapse): blocks (Dp, Np)
        # at index (0, t) then read exactly scan row t of the (Dp, T, Np)
        # producer-layout cost — no transposed copy, and the block's last
        # two dims are tile-divisible (a squeezed middle dim is not)
        cost_tdn = cost_tdn.reshape(Dp, Tp * Np)
    for d_ in used_dirs:
        if in_layout == "dtn":
            if d_:
                in_specs.append(pl.BlockSpec(
                    (Dp, Np), lambda t, Tb=Tb: (0, Tb - 1 - t)
                ))
            else:
                in_specs.append(pl.BlockSpec((Dp, Np), lambda t: (0, t)))
        elif d_:
            in_specs.append(
                pl.BlockSpec((R, Dp, Np), lambda t, Tb=Tb: (Tb - 1 - t, 0, 0))
            )
        else:
            in_specs.append(pl.BlockSpec((R, Dp, Np), lambda t: (t, 0, 0)))
        operands.append(cost_tdn)

    out_specs = []
    out_shapes = []
    kgroups = []
    kadds = []
    for oi, (lanes, rev) in enumerate(groups):
        if rev:
            spec = pl.BlockSpec((R, Dp, Np), lambda t, Tb=Tb: (Tb - 1 - t, 0, 0))
        else:
            spec = pl.BlockSpec((R, Dp, Np), lambda t: (t, 0, 0))
        out_specs.append(spec)
        out_shapes.append(jax.ShapeDtypeStruct((Tp, Dp, Np), out_dtype))
        kgroups.append((tuple(lanes), oi, bool(rev)))
        if adds[oi] is not None:
            a = adds[oi]
            if a.shape[0] < Tp:      # pad rows land in the trimmed tail
                a = jnp.pad(a, ((0, Tp - a.shape[0]), (0, 0), (0, 0)))
            # the add rides the SAME index map as its group's output
            in_specs.append(spec)
            operands.append(a[:Tp])
            kadds.append(len(kadds))
        else:
            kadds.append(None)

    kernel = functools.partial(
        _sgbm_scan_kernel,
        shifts=tuple(shifts), lane_op=lane_op,
        lane_rev=tuple(bool(d_) for d_ in lane_dir), groups=tuple(kgroups),
        p1=p1, p2=p2, n_valid=n_valid, Dp=Dp, Np=Np, R=R, n_in=n_in,
        n_adds=n_adds, group_add=tuple(kadds),
        out_dtype=out_dtype, math_dtype=math_dtype, acc_dtype=acc_dtype,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(Tb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((len(shifts), Dp, Np), math_dtype)],
        interpret=interpret,
    )(*operands)
    outs = outs if isinstance(outs, (tuple, list)) else (outs,)
    if Tp != T:
        # padding rows: fwd groups' tail / bwd groups' tail (their index
        # map wrote the pad block last in natural orientation too — the
        # pad always lands at rows >= T for both)
        outs = tuple(o[:T] for o in outs)
    return outs


def _bt_cost_kernel(
    l_ref,          # (9, TH + k - 1, Wp) int8: l_ftr/l_min/l_max x 3 ch
    r_ref,          # (9, TH + k - 1, Wp) int8: r_min/r_max/r_ftr x 3 ch
    out_ref,        # (DC, TH, Wp) or (TH, DC, Wp) int16/int32 block cost
    *, k: int, DC: int, TH: int, H: int, W: int, out_dtype,
    out_layout: str = "dhw",
):
    """One (row-tile, d-chunk) cell of the fused BT + block-sum cost.

    The feature blocks carry their vertical halo (k-1 rows, edge-replicated
    by the caller), so pixel cost is computed for TH + k - 1 rows and both
    window sums run entirely in registers. Per d: the three right-feature
    planes are aligned with ONE cyclic lane roll (dynamic d0 + static j
    compose), and lanes x < d take the left-edge replicate (reference
    left-pad semantics) via a masked broadcast of column 0 — cyclic wrap
    junk lands only in those masked lanes. Output lanes >= W and rows >= H
    are written as ZEROS: a zero cost row maps the aggregation scans'
    initial carry to itself, so downstream kernels can consume the padded
    volume directly."""
    h = pl.program_id(0)
    d0 = pl.program_id(1) * DC
    # block rows = TH + k - 1 rounded up to the sublane tile; the extra
    # clipped rows at the bottom are computed but never summed
    TI = l_ref.shape[1]
    Wp = out_ref.shape[-1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (TI, Wp), 1)
    l_f = l_ref[0:3].astype(jnp.int32)
    l_mn = l_ref[3:6].astype(jnp.int32)
    l_mx = l_ref[6:9].astype(jnp.int32)

    # all nine right planes ride ONE (9*TI, Wp) vector: one widen, one
    # left-edge column, one dynamic d0 roll, then one static roll per d
    # (vs 9 of each with per-plane math)
    r_all = r_ref[:].astype(jnp.int32).reshape(9 * TI, Wp)
    col0 = r_all[:, 0:1]
    base = pltpu.roll(r_all, d0, axis=1)

    # left-edge replicate (reference pad_l semantics) hoisted OUT of the
    # d loop: lanes x < d must see BT(l(x), r(col 0)). Instead of a
    # 9-plane input select per d (9 ops/(d, px)), compute the edge PIXEL
    # COST once per tile and patch the cost plane per d (1 op) — integer
    # math, bitwise the same values
    c9 = col0.reshape(9, TI, 1)
    rm0, rM0, rf0 = c9[0:3], c9[3:6], c9[6:9]
    c1e = jnp.maximum(jnp.maximum(l_f - rM0, rm0 - l_f), 0)
    c2e = jnp.maximum(jnp.maximum(rf0 - l_mx, l_mn - rf0), 0)
    m3e = jnp.minimum(c1e, c2e)
    pc_edge = m3e[0] + m3e[1] + m3e[2]            # (TI, Wp)

    lo = k // 2
    row0 = h * TH  # global image row of output row 0
    out_row = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 0) + row0
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)

    hs_all = []
    for j in range(DC):
        d = d0 + j
        rolled = _roll_static(base, j) if j else base
        rv = rolled.reshape(9, TI, Wp)
        rm, rM, rf = rv[0:3], rv[3:6], rv[6:9]
        c1 = jnp.maximum(jnp.maximum(l_f - rM, rm - l_f), 0)
        c2 = jnp.maximum(jnp.maximum(rf - l_mx, l_mn - rf), 0)
        m3 = jnp.minimum(c1, c2)
        pc = m3[0] + m3[1] + m3[2]
        # lanes x < d carried cyclic wrap junk through the BT math —
        # overwrite with the edge-replicate cost (see pc_edge above)
        pc = jnp.where(lane < d, pc_edge, pc)
        # horizontal edge replicate: lanes >= W take column W-1
        pc = jnp.where(lane >= W, pc[:, W - 1 : W], pc)
        # vertical k-window sum (halo rows included in the block)
        vs = pc[0:TH]
        for i in range(1, k):
            vs = vs + pc[i : i + TH]
        # horizontal k-window sum with edge replicate at x=0
        hs = vs
        for dx in range(1, lo + 1):
            right = jnp.where(
                out_lane < dx, vs[:, 0:1], _roll_static(vs, dx)
            )
            left = _roll_static(vs, -dx)  # lanes >= W already replicated
            hs = hs + right + left
        # zero the padding (lanes >= W, rows >= H): zero cost rows are
        # scan-neutral for the aggregation kernels
        hs = jnp.where((out_lane >= W) | (out_row >= H), 0, hs)
        if out_layout == "hdw":
            # stores ride in stacked groups of 8 sublanes: per-j
            # single-sublane stores measured ~10 ms slower at 2K/d=256,
            # and stacking all DC at once overflows VMEM
            hs_all.append(hs.astype(out_dtype))
            if len(hs_all) == min(8, DC):
                j0 = j + 1 - len(hs_all)
                out_ref[:, j0 : j + 1, :] = jnp.stack(hs_all, axis=1)
                hs_all = []
        else:
            out_ref[j] = hs.astype(out_dtype)


def _roll_static(x, sh: int):
    if sh < 0:
        sh += x.shape[1]
    return pltpu.roll(x, sh, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("max_dis", "block_size", "cost_bound", "rows_to",
                     "out_layout", "interpret"),
)
def bt_block_cost_pallas(
    l_ftr: jax.Array,          # (H, W, C=3) int32 prefiltered features
    r_ftr: jax.Array,
    max_dis: int,
    block_size: int,
    cost_bound: int | None = None,
    rows_to: int | None = None,  # zero-pad output rows to (at least) this
    out_layout: str = "dhw",     # "dhw" (D, Hp, Wp) | "hdw" (Hp, D, Wp)
    interpret: bool = False,
) -> jax.Array:
    """Fused BT pixel cost + block window sum as ONE Pallas launch,
    returning (D, Hp, Wp) with zeroed padding (Hp/Wp = tile-rounded H/W).
    out_layout='hdw' emits (Hp, D, Wp) instead — the y-scan operand layout,
    so the aggregation's (H, D, W) transpose disappears (a 2.8 GB
    HBM round-trip at 2K/d=256; the in-kernel store pattern change is
    VMEM-local).

    Value-identical on the logical (D, H, W) region to
    `ops/sgbm.py::bt_block_cost(..., out_layout='dhw')`. The XLA fusion of
    the same dataflow costs ~107 ms at 2K/d=256 because every d re-reads
    the feature planes from HBM and the window sums materialize
    chunk-sized intermediates; here the feature tiles sit in VMEM across
    the whole d-chunk loop (the d grid axis is innermost, so Pallas elides
    their re-DMA) and the only HBM writes are the int16 output blocks.

    Requires features in [0, 127] (pre_filter_cap <= 63, the reference
    setting) and cost_bound < 2**15; callers fall back to the XLA path
    otherwise."""
    H, W, C = l_ftr.shape
    if C != 3:
        raise ValueError("bt_block_cost_pallas expects 3-channel features")
    k = block_size
    if k % 2 == 0:
        raise ValueError("bt_block_cost_pallas needs an odd block_size")
    out_dt = jnp.int16 if (cost_bound is not None and cost_bound < 2**15) else jnp.int32

    TH = _BT_TH   # halo recompute = (TH + k - 1)/TH; 16 wastes ~25% vs 8's 100%
    # hdw halves the d chunk: the grouped stacked stores' staging planes
    # put the DC=32 launch ~0.7 MB over the 16 MB VMEM stack at 2K
    DC = min(_BT_DC if out_layout == "dhw" else _BT_DC // 2, max_dis)
    while max_dis % DC:
        DC //= 2
    # rows_to: emitting the extra zero rows here (scan-neutral) lets the
    # aggregation's x-scan consume the volume without its own lane pad
    # (a 1.4 GB copy at 2K)
    GH = -(-max(H, rows_to or 0) // TH)
    GD = max_dis // DC
    Hp = GH * TH
    Wp = _round_up(W, 128)

    # (9, H, W) int8 feature stacks: [ftr, min, max] x 3ch (left),
    # [min, max, ftr] x 3ch (right)
    def interp(f):
        prev = jnp.concatenate([f[..., :1], f[..., :-1]], axis=-1)
        nxt = jnp.concatenate([f[..., 1:], f[..., -1:]], axis=-1)
        lo = (f + prev) // 2
        hi = (f + nxt) // 2
        return (
            jnp.minimum(jnp.minimum(lo, hi), f),
            jnp.maximum(jnp.maximum(lo, hi), f),
        )

    lc = jnp.transpose(l_ftr, (2, 0, 1))
    rc = jnp.transpose(r_ftr, (2, 0, 1))
    l_mn, l_mx = interp(lc)
    r_mn, r_mx = interp(rc)
    lstk = jnp.concatenate([lc, l_mn, l_mx]).astype(jnp.int8)
    rstk = jnp.concatenate([r_mn, r_mx, rc]).astype(jnp.int8)

    # overlapping row tiles with the vertical halo baked in (features are
    # ~40x smaller than the cost volume; the ~2x row duplication is free);
    # tile rows round up to the sublane tile (8) for the block spec
    TI = _round_up(TH + k - 1, 8)
    lo_h = k // 2
    rows = (
        jnp.arange(TI, dtype=jnp.int32)[None, :]
        + jnp.arange(GH, dtype=jnp.int32)[:, None] * TH - lo_h
    ).reshape(-1)
    rows = jnp.clip(rows, 0, H - 1)
    lov = jnp.pad(lstk[:, rows, :], ((0, 0), (0, 0), (0, Wp - W)), mode="edge")
    rov = jnp.pad(rstk[:, rows, :], ((0, 0), (0, 0), (0, Wp - W)), mode="edge")

    kernel = functools.partial(
        _bt_cost_kernel, k=k, DC=DC, TH=TH, H=H, W=W, out_dtype=out_dt,
        out_layout=out_layout,
    )
    if out_layout == "hdw":
        out_spec = pl.BlockSpec((TH, DC, Wp), lambda h, d: (h, d, 0))
        out_shape = jax.ShapeDtypeStruct((Hp, max_dis, Wp), out_dt)
    else:
        out_spec = pl.BlockSpec((DC, TH, Wp), lambda h, d: (d, h, 0))
        out_shape = jax.ShapeDtypeStruct((max_dis, Hp, Wp), out_dt)
    return pl.pallas_call(
        kernel,
        grid=(GH, GD),
        in_specs=[
            pl.BlockSpec((9, TI, Wp), lambda h, d: (0, h, 0)),
            pl.BlockSpec((9, TI, Wp), lambda h, d: (0, h, 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(lov, rov)


@functools.partial(
    jax.jit,
    static_argnames=(
        "p1", "p2", "num_directions", "cost_bound", "interpret",
        "in_layout", "out_layout", "logical_hw",
    ),
)
def sgbm_aggregate_pallas(
    cost: jax.Array,           # integer window cost, layout per in_layout
    p1: int, p2: int,
    num_directions: int = 8,
    cost_bound: int | None = None,
    interpret: bool = False,
    in_layout: str = "hwd",    # "hwd" (H, W, D) | "dhw" (D, H, W)
    out_layout: str = "hwd",   # "hwd" (H, W, D) | "hdw" (H, D, W)
    logical_hw: tuple | None = None,
) -> jax.Array:
    """Drop-in replacement for `ops/sgbm.py::aggregate` on TPU: same
    direction sets (8 = MODE_HH, 5 = MODE_SGBM, 3 = MODE_SGBM_3WAY,
    reference toggle src/main.cpp:161-163), same integer math, scans run
    as Pallas kernels.

    The layout knobs exist because the kernel operands want the line axis
    on lanes ((T, D, N)); consuming (D, H, W) from the fused cost stage and
    emitting (H, D, W) for the lane-major WTA keeps every glue transpose a
    minor-dim-preserving one and never materializes a small-minor-dim
    (here: nothing worse than D=256 lanes) tensor. Values are identical in
    all layouts.

    logical_hw: when the dhw cost arrives PADDED beyond (H, W) — e.g.
    straight from `bt_block_cost_pallas` — pass the logical extent here.
    The padding must be ZERO: a zero cost plane maps the scans' zero
    initial state to itself (L' = 0 + best - minL = 0), so the padded
    rows/lanes behave exactly like the virtual pre-scan state and the
    logical region is bit-identical; the final accumulation slices back to
    (H, D, W) (the slices fuse into the adds)."""
    parts = sgbm_aggregate_partials_pallas(
        cost, p1, p2, num_directions, cost_bound=cost_bound,
        interpret=interpret, in_layout=in_layout, logical_hw=logical_hw,
    )
    if in_layout == "dhw":
        D, H, W = cost.shape
        if logical_hw is not None:
            H, W = logical_hw
    elif in_layout == "hdw":
        H, D, W = cost.shape
        if logical_hw is not None:
            H, W = logical_hw
    else:
        H, W, D = cost.shape
    S = parts[0][:H, :, :W].astype(jnp.int32)
    for q in parts[1:]:
        S = S + q[:H, :, :W].astype(jnp.int32)
    if out_layout == "hdw":
        return S
    return jnp.transpose(S, (0, 2, 1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "p1", "p2", "num_directions", "cost_bound", "interpret",
        "in_layout", "logical_hw",
    ),
)
def sgbm_aggregate_partials_pallas(
    cost: jax.Array,
    p1: int, p2: int,
    num_directions: int = 8,
    cost_bound: int | None = None,
    interpret: bool = False,
    in_layout: str = "hwd",
    logical_hw: tuple | None = None,
) -> tuple:
    """The aggregation WITHOUT materializing S: returns a tuple of
    (rows>=H, D, lanes>=W)-layout integer partial tensors whose elementwise
    sum over the logical region equals `sgbm_aggregate_pallas(...,
    out_layout='hdw')` — the exact input contract of
    kernels/select_pallas.py::select_disparity_partials_pallas. At
    2K/d=256 this skips ~2.8 GB of int32 S writes + re-reads and the
    int32 transpose glue (the x-scan pair is summed at uint16 BEFORE its
    transpose when 2 * (cost_bound + p2) < 2**16)."""
    if in_layout == "dhw":
        D, H, W = cost.shape
        if logical_hw is not None:
            H, W = logical_hw
    elif in_layout == "hdw":
        H, D, W = cost.shape
        if logical_hw is not None:
            H, W = logical_hw
    else:
        H, W, D = cost.shape
    if num_directions not in (3, 5, 8):
        raise ValueError(f"num_directions must be 3, 5 or 8, got {num_directions}")

    l_bound = None if cost_bound is None else int(cost_bound) + int(p2)
    # 16-bit HBM tensors need the sublane dim (D) on the 16-wide tile
    if l_bound is not None and 3 * l_bound < 2**16 and D % 16 == 0:
        out_dt = jnp.uint16
        cost_dt = jnp.int16 if int(cost_bound) < 2**15 else jnp.int32
    else:
        out_dt = jnp.int32
        cost_dt = jnp.int32
    # narrow carry storage: any single lane's L is <= l_bound by
    # induction (best - minL <= p2); compute stays int32 in-kernel
    math_dt = (
        jnp.int16 if (l_bound is not None and l_bound < 2**15) else jnp.int32
    )
    acc_dt = (
        jnp.uint16 if (l_bound is not None and 3 * l_bound < 2**16)
        else jnp.int32
    )
    cost = cost.astype(cost_dt)

    # x-scans: T = W, line axis = H -> (W, D, H); scan-axis padding rows
    # (zero cost) are scan-neutral, line-axis lanes pad to the 128 tile
    if in_layout == "dhw":
        cx = jnp.transpose(cost, (2, 0, 1))
    elif in_layout == "hdw":
        cx = jnp.transpose(cost, (2, 1, 0))
    else:
        cx = jnp.transpose(cost, (1, 2, 0))
    cx = jnp.pad(
        cx, ((0, 0), (0, 0), (0, _round_up(cx.shape[2], 128) - cx.shape[2]))
    )
    # x-scan pair: sum BEFORE the transpose, at uint16 when the bound
    # allows (each group is one lane, <= l_bound) — half the transpose
    # bytes. The scan-padding rows beyond W are KEPT (their values are
    # finite junk the select kernel masks per its lanes >= W contract),
    # so no slice/re-pad copies: only the scans' R-padding tail (rarely
    # present) is trimmed to the lane tile.
    pair_dt = (
        jnp.uint16
        if (l_bound is not None and 2 * l_bound < 2**16
            and out_dt == jnp.uint16)
        else jnp.int32
    )
    Tx = cx.shape[0]                        # trim only the scans' R padding
    merged_fits = _best_plan_r(
        cx.shape[1], cx.shape[2], 2, 2, 2, cx.dtype.itemsize,
        jnp.dtype(out_dt).itemsize, jnp.dtype(math_dt).itemsize,
    ) is not None
    if merged_fits:
        Lx_f, Lx_b = sgbm_scan_pallas(
            cx, p1, p2, shifts=(0, 0), lane_dir=(False, True),
            groups=(((0,), False), ((1,), True)), n_valid=H,
            out_dtype=out_dt, math_dtype=math_dt, acc_dtype=acc_dt,
            interpret=interpret,
        )
        Sx = Lx_f[:Tx].astype(pair_dt) + Lx_b[:Tx].astype(pair_dt)
    else:
        # the launch would split fwd/bwd anyway (VMEM): make the bwd
        # launch ABSORB the fwd result (group_adds) so the pair sum never
        # runs as a standalone XLA add re-reading both volumes — at 2K
        # that add+bitcast fusion alone measured 6.6 ms
        (Lx_f,) = sgbm_scan_pallas(
            cx, p1, p2, shifts=(0,), lane_dir=(False,),
            groups=(((0,), False),), n_valid=H,
            out_dtype=out_dt, math_dtype=math_dt, acc_dtype=acc_dt,
            interpret=interpret,
        )
        (Sx,) = sgbm_scan_pallas(
            cx, p1, p2, shifts=(0,), lane_dir=(True,),
            groups=(((0,), True),), n_valid=H,
            out_dtype=pair_dt, math_dtype=math_dt,
            acc_dtype=jnp.int32 if pair_dt == jnp.int32 else acc_dt,
            group_adds=(Lx_f,), interpret=interpret,
        )
        Sx = Sx[:Tx]
    Px = jnp.transpose(Sx, (2, 1, 0))       # (lanes >= H, D, rows_W >= W)

    # y-scans: T = H, line axis = W -> (H, D, W). Scan rows pad to the
    # sublane tile (zero rows are scan-neutral) so the partial outputs
    # directly satisfy the select kernel's rows >= round_up(H, 8)
    # contract; the pad fuses into the transpose. in_layout='hdw' (the
    # bt_block_cost_pallas out_layout='hdw' handoff) needs NO transpose
    # at all here.
    y_layout = "tdn"
    if in_layout == "dhw":
        # when the launch would run R = 1 anyway (2K-class shapes — the
        # VMEM plan caps rows-per-step), consume the (D, Hp, Wp) cost
        # DIRECTLY via squeezed blocks: the (Hp, D, Wp) transpose copy
        # (~4.7 ms / 1.5 GB r+w at 2K) never exists
        n_in_y = 2 if num_directions == 8 else 1
        n_out_y = 2 if num_directions == 8 else 1
        n_lanes_y = {3: 1, 5: 3, 8: 6}[num_directions]
        Np_y = _round_up(cost.shape[2], 128)
        r2_fits = _plan_bytes(
            2, D, Np_y, n_in_y, n_out_y, cost.dtype.itemsize,
            jnp.dtype(out_dt).itemsize, n_lanes_y,
            jnp.dtype(math_dt).itemsize,
        ) <= _VMEM_BUDGET
        if not r2_fits:
            y_layout = "dtn"
            cy = jnp.pad(
                cost,
                (
                    (0, 0),
                    (0, _round_up(cost.shape[1], 8) - cost.shape[1]),
                    (0, Np_y - cost.shape[2]),
                ),
            )
        else:
            cy = jnp.transpose(cost, (1, 0, 2))
    elif in_layout == "hdw":
        cy = cost
    else:
        cy = jnp.transpose(cost, (0, 2, 1))
    if y_layout == "tdn":
        cy = jnp.pad(
            cy,
            (
                (0, _round_up(cy.shape[0], 8) - cy.shape[0]),
                (0, 0),
                (0, _round_up(cy.shape[2], 128) - cy.shape[2]),
            ),
        )
    if num_directions == 3:
        (Ld,) = sgbm_scan_pallas(
            cy, p1, p2, shifts=(0,), lane_dir=(False,),
            groups=(((0,), False),), n_valid=W,
            out_dtype=out_dt, math_dtype=math_dt, acc_dtype=acc_dt,
            in_layout=y_layout, interpret=interpret,
        )
        return (Px, Ld)
    elif num_directions == 5:
        (Ld,) = sgbm_scan_pallas(
            cy, p1, p2, shifts=(0, 1, -1), lane_dir=(False, False, False),
            groups=(((0, 1, 2), False),), n_valid=W,
            out_dtype=out_dt, math_dtype=math_dt, acc_dtype=acc_dt,
            in_layout=y_layout, interpret=interpret,
        )
        return (Px, Ld)
    else:
        Ld_f, Ld_b = sgbm_scan_pallas(
            cy, p1, p2, shifts=(0, 1, -1, 0, 1, -1),
            lane_dir=(False, False, False, True, True, True),
            groups=(((0, 1, 2), False), ((3, 4, 5), True)), n_valid=W,
            out_dtype=out_dt, math_dtype=math_dt, acc_dtype=acc_dt,
            in_layout=y_layout, interpret=interpret,
        )
        return (Px, Ld_f, Ld_b)
