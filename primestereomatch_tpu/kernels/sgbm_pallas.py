"""Pallas TPU kernel for the SGBM directional DP aggregation.

The XLA formulation (`ops/sgbm.py::_dp_line_stack`) is a `lax.scan` whose
per-step state is a full image line — correct, but each of the ~H+W
sequential steps pays XLA loop overhead (dynamic-update-slice of the
emitted plane in HBM, carry repacking), which dominates SGBM wall-clock
on TPU (CLAUDE.md round-2 lever). This kernel runs the same recurrence
with the carry RESIDENT IN VMEM across a sequential 1-D grid:

  * grid = (T,): TPU grid steps execute in order, so a VMEM scratch
    carries (L, implicitly min_d L) from step to step; Pallas
    double-buffers the per-step cost planes and output stores
    automatically via the BlockSpec index maps.
  * both scan orientations ride ONE kernel launch: the backward lanes
    read the SAME cost tensor through a second operand whose index map
    runs t -> T-1-t, and write through an output whose index map does
    the same — no materialized flipped copies anywhere (the XLA path
    stacks a flipped volume: 2.8 GB at 2K/d=256).
  * layout is (T, D, N): D on sublanes (d+-1 penalty shifts are sublane
    rolls, min over d a sublane reduce), the line axis N on lanes
    (diagonal shears are lane rolls with a zero shifted in at the
    global edge — `_dp_line` semantics, L=0/minL=0 outside).
  * per-direction math is int32 in VMEM; HBM only ever sees the narrow
    dtypes (int16 costs in, uint16 grouped sums out) when the static
    cost bound allows — identical values, half the traffic.

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
    lane_op: tuple,            # operand index (0 fwd / 1 bwd) per lane
    groups: tuple,             # tuple of (lane_indices, out_index)
    p1: int, p2: int,
    n_valid: int, Dp: int, Np: int,
    n_in: int,
    out_dtype,
):
    c_refs = refs[:n_in]
    out_refs = refs[n_in:n_in + len(groups)]
    L_ref = refs[n_in + len(groups)]

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        L_ref[:] = jnp.zeros_like(L_ref)

    lane_ix = jax.lax.broadcasted_iota(jnp.int32, (Dp, Np), 1)
    sub_ix = jax.lax.broadcasted_iota(jnp.int32, (Dp, Np), 0)
    p1_ = jnp.int32(p1)
    p2_ = jnp.int32(p2)

    Ls = []
    for si, sh in enumerate(shifts):
        Lp = L_ref[si]
        minLp = jnp.min(Lp, axis=0, keepdims=True)        # (1, Np)
        if sh == 1:
            # shear: lane i <- lane i-1, zero shifted in at the edge
            Lp = _roll(Lp, 1, axis=1)
            minLp = _roll(minLp, 1, axis=1)
            Lp = jnp.where(lane_ix >= 1, Lp, 0)
            minLp = jnp.where(lane_ix[:1] >= 1, minLp, 0)
        elif sh == -1:
            # lane i <- lane i+1; the lane entering at the global edge
            # (and all padding) becomes zero
            Lp = _roll(Lp, -1, axis=1)
            minLp = _roll(minLp, -1, axis=1)
            Lp = jnp.where(lane_ix < n_valid - 1, Lp, 0)
            minLp = jnp.where(lane_ix[:1] < n_valid - 1, minLp, 0)
        d_lo = _roll(Lp, 1, axis=0)
        d_lo = jnp.where(sub_ix >= 1, d_lo, _BIG)
        d_hi = _roll(Lp, -1, axis=0)
        d_hi = jnp.where(sub_ix < Dp - 1, d_hi, _BIG)
        best = jnp.minimum(
            jnp.minimum(Lp, jnp.minimum(d_lo, d_hi) + p1_), minLp + p2_
        )
        c = c_refs[lane_op[si]][0].astype(jnp.int32)
        L = c + best - minLp
        Ls.append(L)
        L_ref[si] = L

    for lanes, oi in groups:
        acc = Ls[lanes[0]]
        for i in lanes[1:]:
            acc = acc + Ls[i]
        out_refs[oi][0] = acc.astype(out_dtype)


def sgbm_scan_pallas(
    cost_tdn: jax.Array,       # (T, Dp, Np) int16/int32 cost, padded
    p1: int, p2: int,
    shifts: tuple,             # lateral shift per lane (0 / +1 / -1)
    lane_dir: tuple,           # per lane: False = forward t, True = reversed
    groups: tuple,             # tuple of (lane_indices, reversed) output groups
    n_valid: int,              # logical line length (<= Np)
    out_dtype=jnp.uint16,
    interpret: bool = False,
):
    """Run all lanes over the T axis in one launch. Forward lanes read
    step t, reversed lanes read step T-1-t (same array, second operand —
    no flipped copy). Each group emits sum(L over its lanes) as its own
    (T, Dp, Np) output; groups marked reversed are written back in
    natural orientation (their index map reverses too). Returns a tuple
    of group outputs."""
    T, Dp, Np = cost_tdn.shape
    need_bwd = any(lane_dir)
    lane_op = tuple(1 if d else 0 for d in lane_dir)
    n_in = 2 if need_bwd else 1

    in_specs = [pl.BlockSpec((1, Dp, Np), lambda t: (t, 0, 0))]
    operands = [cost_tdn]
    if need_bwd:
        in_specs.append(
            pl.BlockSpec((1, Dp, Np), lambda t, T=T: (T - 1 - t, 0, 0))
        )
        operands.append(cost_tdn)

    out_specs = []
    out_shapes = []
    kgroups = []
    for oi, (lanes, rev) in enumerate(groups):
        if rev:
            out_specs.append(
                pl.BlockSpec((1, Dp, Np), lambda t, T=T: (T - 1 - t, 0, 0))
            )
        else:
            out_specs.append(pl.BlockSpec((1, Dp, Np), lambda t: (t, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((T, Dp, Np), out_dtype))
        kgroups.append((tuple(lanes), oi))

    kernel = functools.partial(
        _sgbm_scan_kernel,
        shifts=tuple(shifts), lane_op=lane_op, groups=tuple(kgroups),
        p1=p1, p2=p2, n_valid=n_valid, Dp=Dp, Np=Np, n_in=n_in,
        out_dtype=out_dtype,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((len(shifts), Dp, Np), jnp.int32)],
        interpret=interpret,
    )(*operands)
    return outs if isinstance(outs, (tuple, list)) else (outs,)


@functools.partial(
    jax.jit,
    static_argnames=("p1", "p2", "num_directions", "cost_bound", "interpret"),
)
def sgbm_aggregate_pallas(
    cost: jax.Array,           # (H, W, D) integer window cost
    p1: int, p2: int,
    num_directions: int = 8,
    cost_bound: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for `ops/sgbm.py::aggregate` on TPU: same
    direction sets (8 = MODE_HH, 5 = MODE_SGBM, 3 = MODE_SGBM_3WAY,
    reference toggle src/main.cpp:161-163), same integer math, scans run
    as Pallas kernels. Returns (H, W, D) int32."""
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
    cost = cost.astype(cost_dt)

    Hp = _round_up(H, 128)
    Wp = _round_up(W, 128)

    # x-scans: T = W, line axis = H. (H, W, D) -> (W, D, H)
    cx = jnp.transpose(cost, (1, 2, 0))
    cx = jnp.pad(cx, ((0, 0), (0, 0), (0, Hp - H)))
    Lx_f, Lx_b = sgbm_scan_pallas(
        cx, p1, p2, shifts=(0, 0), lane_dir=(False, True),
        groups=(((0,), False), ((1,), True)), n_valid=H,
        out_dtype=out_dt, interpret=interpret,
    )
    # (W, D, Hp) -> (H, W, D)
    S = jnp.transpose(Lx_f[:, :, :H], (2, 0, 1)).astype(jnp.int32)
    S = S + jnp.transpose(Lx_b[:, :, :H], (2, 0, 1))

    # y-scans: T = H, line axis = W. (H, W, D) -> (H, D, W)
    cy = jnp.transpose(cost, (0, 2, 1))
    cy = jnp.pad(cy, ((0, 0), (0, 0), (0, Wp - W)))
    if num_directions == 3:
        (Ld,) = sgbm_scan_pallas(
            cy, p1, p2, shifts=(0,), lane_dir=(False,),
            groups=(((0,), False),), n_valid=W,
            out_dtype=out_dt, interpret=interpret,
        )
        return S + jnp.transpose(Ld[:, :, :W], (0, 2, 1))
    if num_directions == 5:
        (Ld,) = sgbm_scan_pallas(
            cy, p1, p2, shifts=(0, 1, -1), lane_dir=(False, False, False),
            groups=(((0, 1, 2), False),), n_valid=W,
            out_dtype=out_dt, interpret=interpret,
        )
        return S + jnp.transpose(Ld[:, :, :W], (0, 2, 1))

    Ld_f, Ld_b = sgbm_scan_pallas(
        cy, p1, p2, shifts=(0, 1, -1, 0, 1, -1),
        lane_dir=(False, False, False, True, True, True),
        groups=(((0, 1, 2), False), ((3, 4, 5), True)), n_valid=W,
        out_dtype=out_dt, interpret=interpret,
    )
    S = S + jnp.transpose(Ld_f[:, :, :W], (0, 2, 1))
    S = S + jnp.transpose(Ld_b[:, :, :W], (0, 2, 1))
    return S
