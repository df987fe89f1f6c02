"""Pallas TPU kernel: fused SGBM disparity selection from partial sums.

`ops/sgbm.py::select_disparity_hdw` needs four volume-wide reductions
(argmin/min, the far-set min for uniqueness, the d_best +- 1 neighbour
costs) plus the right-view diagonal argmin walk. In XLA that means
materializing the int32 S = sum(direction groups) (2.8 GB at 2K/d=256)
and re-streaming it through a chunked fori_loop whose dynamic slices
copy the volume again — measured ~70 ms at 2K while the pure HBM
traffic of the math is ~10 ms.

This kernel consumes the aggregation's GROUP PARTIAL tensors (uint16,
kernels/sgbm_pallas.py) directly — S never exists in HBM — and runs two
sequential passes per row tile with all running planes VMEM-resident:

  pass 0 (d descending): running (min, argmin) for d_best/s_best
      (<= ties keep the smaller d == ascending first-min), and the
      right-view diagonal walk rd(y, xr) = argmin_d S(y, d, xr + d):
      the running pair lives at lane x = xr + d, so each d -> d-1 step
      is one lane shift with BIG entering at lane W-1 (the exact
      formulation of ops/sgbm.py::select_disparity_hdw:533-554).
  pass 1 (re-reads the blocks): the far-set min (uniqueness), the
      exact d_best -/+ 1 neighbour costs, then the sub-pixel parabola
      the rd_at masked rolls, and the uniqueness + LR invalidation —
      all integer/f32 math identical to the XLA op, so results are
      BIT-IDENTICAL.

The LR epilogue (rd sampled at x - d_best) ALSO runs in-kernel: an XLA
take_along_axis on the (H, W) plane measured 26.5 ms at 2K (TPU gathers
serialize per element); here it is one masked dynamic lane roll per d
during pass 1 — the exact D-masked-shift formulation, ~1 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(1 << 28)
# tuning hooks (None = defaults chosen in select_disparity_partials_pallas)
_SEL_TH = None       # rows per tile (one-pass default 16)
_SEL_DC = None       # disparities per grid step (one-pass default 16)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _select_kernel(
    *refs,
    n_parts: int, D: int, DC: int, TH: int, W: int,
    uniqueness_ratio: int, disp12_max_diff: int, min_disparity: int,
):
    parts = refs[:n_parts]
    out_d = refs[n_parts]
    scr = refs[n_parts + 1]      # (8, TH, Wp) int32 running planes:
    # [0]=walk min m, [1]=walk arg a (-> rd), [2]=s_best, [3]=d_best,
    # [4]=s_alt, [5]=s_m, [6]=s_p, [7]=rd_at (rd sampled at x - d_best)
    p = pl.program_id(1)
    c = pl.program_id(2)
    n_dc = pl.num_programs(2)
    Wp = out_d.shape[-1]

    S = parts[0][...].astype(jnp.int32)
    for k in range(1, n_parts):
        S = S + parts[k][...].astype(jnp.int32)          # (TH, DC, Wp)

    lane = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)
    big = jnp.int32(_BIG)

    @pl.when((p == 0) & (c == 0))
    def _():
        scr[0] = jnp.full((TH, Wp), big)
        scr[1] = jnp.zeros((TH, Wp), jnp.int32)
        scr[2] = jnp.full((TH, Wp), big)
        scr[3] = jnp.zeros((TH, Wp), jnp.int32)
        scr[4] = jnp.full((TH, Wp), big)
        scr[5] = jnp.full((TH, Wp), big)
        scr[6] = jnp.full((TH, Wp), big)
        scr[7] = jnp.zeros((TH, Wp), jnp.int32)

    @pl.when(p == 0)
    def _():
        # this grid step's blocks hold d in [D - (c+1)*DC, D - c*DC)
        # (descending index map); walk k from the top down
        m = scr[0]
        a = scr[1]
        sb = scr[2]
        db = scr[3]
        d0 = D - (c + 1) * DC
        for k in range(DC - 1, -1, -1):
            d_cur = jnp.int32(d0 + k)
            plane = S[:, k, :]
            # lanes >= W hold scan-padding values (zeros) — the diagonal
            # may only see BIG there (select_disparity_hdw's slices stop
            # at W); the shift brings BIG in at lane W-1 exactly like
            # the XLA pad
            plane_w = jnp.where(lane < W, plane, big)
            m = jnp.where(lane >= W - 1, big, pltpu.roll(m, Wp - 1, axis=1))
            a = pltpu.roll(a, Wp - 1, axis=1)
            take = plane_w <= m
            m = jnp.where(take, plane_w, m)
            a = jnp.where(take, d_cur, a)
            tb = plane <= sb
            sb = jnp.where(tb, plane, sb)
            db = jnp.where(tb, d_cur, db)
        scr[0] = m
        scr[1] = a
        scr[2] = sb
        scr[3] = db

    @pl.when(p == 1)
    def _():
        sb = scr[2]
        db = scr[3]
        s_alt = scr[4]
        s_m = scr[5]
        s_p = scr[6]
        rd_at = scr[7]
        rd = scr[1]
        dm_i = jnp.clip(db - 1, 0, D - 1)
        dp_i = jnp.clip(db + 1, 0, D - 1)
        d0 = c * DC
        for k in range(DC):
            d_cur = jnp.int32(d0 + k)
            plane = S[:, k, :]
            far = jnp.abs(d_cur - db) > 1
            s_alt = jnp.where(far, jnp.minimum(s_alt, plane), s_alt)
            s_m = jnp.where(d_cur == dm_i, plane, s_m)
            s_p = jnp.where(d_cur == dp_i, plane, s_p)
            # rd sampled at x - d_best: one masked dynamic lane roll per d
            # (shift amounts are POSITIVE — Mosaic miscompiles negative
            # dynamic rotates at non-power-of-two vreg widths). Lanes with
            # x < d read circular junk that the LR edge terms mask below
            # (exactly the `x - d_best < 0` clause of select_disparity_hdw).
            rd_at = jnp.where(
                db == d_cur, pltpu.roll(rd, d_cur, axis=1), rd_at
            )
        scr[4] = s_alt
        scr[5] = s_m
        scr[6] = s_p
        scr[7] = rd_at

        @pl.when(c == n_dc - 1)
        def _():
            not_unique = (s_alt < big) & (
                s_alt * (100 - uniqueness_ratio) < sb * 100
            )
            denom = s_m + s_p - 2 * sb
            interior = (db > 0) & (db < D - 1) & (denom > 0)
            frac = jnp.where(
                interior,
                jnp.rint(
                    (s_m - s_p).astype(jnp.float32) * 8.0
                    / jnp.maximum(denom, 1).astype(jnp.float32)
                ).astype(jnp.int32),
                0,
            )
            disp16 = (db + min_disparity) * 16 + frac
            inv_val = jnp.int32((min_disparity - 1) * 16)
            invalid = not_unique
            if disp12_max_diff >= 0:
                x = lane
                lr_bad = (jnp.abs(rd_at - db) > disp12_max_diff) & (x - db >= 0)
                lr_bad = lr_bad | ((x - db < 0) & (db > 0))
                invalid = invalid | lr_bad
            out_d[...] = jnp.where(invalid, inv_val, disp16)


def _select_kernel_1p(
    *refs,
    n_parts: int, D: int, DC: int, TH: int, W: int, SH: int,
    uniqueness_ratio: int, disp12_max_diff: int, min_disparity: int,
):
    """Single-pass variant: every volume-wide quantity rides PACKED keys
    k = (value << SH) | d, so min(k) resolves value ties to the smaller d
    — exactly the first-min rule — and the walk/argmin each cost one
    roll/min. The far-set min (uniqueness) comes from a running TOP-4 of
    packed keys: at most 3 disparities are ever 'near' (d_best - 1 .. + 1),
    so the 4 smallest keys always contain an entry whose value equals the
    exact far-min (ties in value make the kept/dropped far entries
    interchangeable). The d_best -/+ 1 neighbour costs ride a
    pending-capture: descending arrival order means S[d_best + 1] is the
    previous plane when the best updates, and S[d_best - 1] is the next
    plane. Requires (max value << SH) < 2**30 — the caller falls back to
    the two-pass kernel otherwise."""
    parts = refs[:n_parts]
    out_d = refs[n_parts]
    scr = refs[n_parts + 1]      # (16, TH, Wp) int32 running planes:
    # [0]=walk key, [1]=best key, [2..5]=top-4 keys, [6]=s_m, [7]=s_p,
    # [8]=pending (0/1), [9]=prev plane
    c = pl.program_id(1)
    n_dc = pl.num_programs(1)
    Wp = out_d.shape[-1]
    BIGK = jnp.int32(1 << 30)

    S = parts[0][...].astype(jnp.int32)
    for k in range(1, n_parts):
        S = S + parts[k][...].astype(jnp.int32)          # (TH, DC, Wp)

    lane = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)
    in_w = lane < W

    @pl.when(c == 0)
    def _():
        for i in range(6):
            scr[i] = jnp.full((TH, Wp), BIGK)
        scr[6] = jnp.full((TH, Wp), BIGK)
        scr[7] = jnp.full((TH, Wp), BIGK)
        scr[8] = jnp.zeros((TH, Wp), jnp.int32)
        scr[9] = jnp.zeros((TH, Wp), jnp.int32)

    wk = scr[0]
    bk = scr[1]
    k1, k2, k3, k4 = scr[2], scr[3], scr[4], scr[5]
    s_m = scr[6]
    s_p = scr[7]
    pend = scr[8]
    prev = scr[9]
    d0 = D - (c + 1) * DC
    for k in range(DC - 1, -1, -1):
        d_cur = jnp.int32(d0 + k)
        plane = S[:, k, :]
        key = (plane << SH) | d_cur
        key_w = jnp.where(in_w, key, BIGK)
        # diagonal walk: one lane shift + one min (BIG enters at W-1)
        wk = jnp.minimum(
            jnp.where(lane >= W - 1, BIGK, pltpu.roll(wk, Wp - 1, axis=1)),
            key_w,
        )
        # d_best -1 neighbour: the plane AFTER the best-setting step
        s_m = jnp.where(pend > 0, plane, s_m)
        take = key < bk
        bk = jnp.minimum(bk, key)
        # d_best +1 neighbour: the plane BEFORE it (clipped: the plane
        # itself at the very first step, d = D-1)
        if k == DC - 1:
            sp_src = jnp.where(c == 0, plane, prev)
        else:
            sp_src = prev
        s_p = jnp.where(take, sp_src, s_p)
        pend = jnp.where(take, 1, 0)
        prev = plane
        # top-4 smallest keys (insertion network)
        lo1 = jnp.minimum(k1, key)
        hi1 = jnp.maximum(k1, key)
        lo2 = jnp.minimum(k2, hi1)
        hi2 = jnp.maximum(k2, hi1)
        lo3 = jnp.minimum(k3, hi2)
        hi3 = jnp.maximum(k3, hi2)
        lo4 = jnp.minimum(k4, hi3)
        k1, k2, k3, k4 = lo1, lo2, lo3, lo4
    scr[0] = wk
    scr[1] = bk
    scr[2], scr[3], scr[4], scr[5] = k1, k2, k3, k4
    scr[6] = s_m
    scr[7] = s_p
    scr[8] = pend
    scr[9] = prev

    @pl.when(c == n_dc - 1)
    def _():
        dmask = jnp.int32((1 << SH) - 1)
        db = bk & dmask
        sb = bk >> SH
        rd = wk & dmask
        # pending still set means d_best == 0: dm_i clips to 0 -> s_best
        s_m2 = jnp.where(pend > 0, sb, s_m)
        # far-set min from the top-4 (BIGK >> SH marks 'no far entry')
        s_alt = jnp.full((TH, Wp), BIGK >> SH)
        for kk in (k1, k2, k3, k4):
            dk = kk & dmask
            far = jnp.abs(dk - db) > 1
            s_alt = jnp.where(far, jnp.minimum(s_alt, kk >> SH), s_alt)
        not_unique = (s_alt < (BIGK >> SH)) & (
            s_alt * (100 - uniqueness_ratio) < sb * 100
        )
        denom = s_m2 + s_p - 2 * sb
        interior = (db > 0) & (db < D - 1) & (denom > 0)
        frac = jnp.where(
            interior,
            jnp.rint(
                (s_m2 - s_p).astype(jnp.float32) * 8.0
                / jnp.maximum(denom, 1).astype(jnp.float32)
            ).astype(jnp.int32),
            0,
        )
        disp16 = (db + min_disparity) * 16 + frac
        inv_val = jnp.int32((min_disparity - 1) * 16)
        invalid = not_unique
        if disp12_max_diff >= 0:
            # rd sampled at x - d_best: D masked dynamic lane rolls on the
            # small (TH, Wp) planes (positive shifts only; fori_loop — a
            # static unroll put ~10 MB of roll temporaries on the stack)
            rd_at = jax.lax.fori_loop(
                0, D,
                lambda d, acc: jnp.where(
                    db == d, pltpu.roll(rd, d, axis=1), acc
                ),
                jnp.zeros((TH, Wp), jnp.int32),
            )
            x = lane
            lr_bad = (jnp.abs(rd_at - db) > disp12_max_diff) & (x - db >= 0)
            lr_bad = lr_bad | ((x - db < 0) & (db > 0))
            invalid = invalid | lr_bad
        out_d[...] = jnp.where(invalid, inv_val, disp16)


def select_disparity_partials_pallas(
    parts: tuple,              # (rows>=H, D, lanes>=W)-layout int tensors
    hw: tuple[int, int],       # logical (H, W)
    uniqueness_ratio: int,
    disp12_max_diff: int,
    min_disparity: int = 0,
    value_bound: int | None = None,  # static bound on sum(parts) values
    interpret: bool = False,
) -> jax.Array:
    """Bit-identical to `select_disparity_hdw(sum(parts)[:H, :, :W], ...)`
    without ever materializing the int32 sum in HBM. Each part is an
    (H', D, W')-layout integer tensor with H' >= H rows and W' >= W lanes
    (extra rows/lanes hold finite junk — the aggregation kernels'
    zero-padded scan outputs qualify). Returns (H, W) int16, 16x scale.

    With `value_bound` (and (bound+1) << ceil(log2(D)) < 2**30 — every
    reference parameter set qualifies) the SINGLE-PASS packed-key kernel
    runs: half the partial-sum DMA of the two-pass form."""
    H, W = hw
    D = parts[0].shape[1]
    if any(q.shape[1] != D for q in parts):
        raise ValueError("partials disagree on D")
    SH = max(1, (D - 1).bit_length())
    one_pass = (
        value_bound is not None and ((value_bound + 1) << SH) < (1 << 30)
    )
    # one-pass holds ~12 extra running planes + the widened S chunk in
    # VMEM: DC=32 put the 2K launch ~6 MB over the 16 MB stack
    DC = min((_SEL_DC or 16) if one_pass else 32, D)
    while D % DC:
        DC //= 2
    # output blocks are (TH, Wp) so TH must be sublane-divisible; the
    # aggregation partials arrive with rows >= round_up(H, 8) (x-partial
    # rows are lane-padded, the y-scan cost rows are pre-padded).
    # TH sweep on v5e 2K/d=256 one-pass: (TH=8, DC=16) 27.6 ms wall,
    # (16, 8) 27.0, (16, 16)/(24, 8)/(32, 8) exceed the VMEM stack —
    # the sequential grid-step count is NOT what binds this kernel, so
    # the proven (8, 16) stays the default and the hooks remain for
    # future sweeps
    TH = _SEL_TH or 8
    Hp = _round_up(H, TH)
    n_dc = D // DC
    Wp = _round_up(W, 128)

    def fit(q):
        if q.shape[0] < Hp or q.shape[2] < Wp:
            # fallback for hand-fed tensors (tests); production partials
            # are already padded — this jnp.pad copies the whole tensor
            q = jnp.pad(
                q,
                (
                    (0, max(0, Hp - q.shape[0])),
                    (0, 0),
                    (0, max(0, Wp - q.shape[2])),
                ),
            )
        return q

    parts = tuple(fit(q) for q in parts)

    if one_pass:
        kernel = functools.partial(
            _select_kernel_1p, n_parts=len(parts), D=D, DC=DC, TH=TH, W=W,
            SH=SH, uniqueness_ratio=uniqueness_ratio,
            disp12_max_diff=disp12_max_diff, min_disparity=min_disparity,
        )
        in_specs = [
            pl.BlockSpec(
                (TH, DC, Wp), lambda i, c, n=n_dc: (i, n - 1 - c, 0)
            )
            for _ in parts
        ]
        out = pl.pallas_call(
            kernel,
            grid=(Hp // TH, n_dc),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TH, Wp), lambda i, c: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
            scratch_shapes=[pltpu.VMEM((16, TH, Wp), jnp.int32)],
            interpret=interpret,
        )(*parts)
        return out[:H, :W].astype(jnp.int16)

    kernel = functools.partial(
        _select_kernel, n_parts=len(parts), D=D, DC=DC, TH=TH, W=W,
        uniqueness_ratio=uniqueness_ratio,
        disp12_max_diff=disp12_max_diff, min_disparity=min_disparity,
    )
    # pass 0 walks chunks top-down, pass 1 re-reads them bottom-up
    in_specs = [
        pl.BlockSpec(
            (TH, DC, Wp),
            lambda i, p, c, n=n_dc: (i, p * c + (1 - p) * (n - 1 - c), 0),
        )
        for _ in parts
    ]
    out_spec = pl.BlockSpec((TH, Wp), lambda i, p, c: (i, 0))
    out = pl.pallas_call(
        kernel,
        grid=(Hp // TH, 2, n_dc),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, TH, Wp), jnp.int32)],
        interpret=interpret,
    )(*parts)
    return out[:H, :W].astype(jnp.int16)
