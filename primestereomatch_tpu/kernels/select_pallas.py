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
      (<= ties keep the smaller d == ascending first-min).
  pass 1 (re-reads the blocks): the far-set min (uniqueness) and the
      exact d_best -/+ 1 neighbour costs.

The cv::StereoSGBM selection tail (`_ocv_select_epilogue` — truncating
integer sub-pixel, minX band, SCATTER-based pseudo right disparity, the
floor/ceil dual LR check; spec: tests/oracle_sgbm.py::select_disparity)
then runs in-kernel on the small (TH, Wp) planes: the disp2 scatter is
a descending-d running pair shifted one lane per step, and the two LR
lookups are masked dynamic rolls — an XLA take_along_axis on the (H, W)
plane measured 26.5 ms at 2K (TPU gathers serialize per element).
Results are BIT-IDENTICAL to ops/sgbm.py::select_disparity_hdw.
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


def _ocv_select_epilogue(
    db, sb, not_unique, s_m, s_p, lane, *,
    D: int, W: int, disp12_max_diff: int, min_disparity: int,
    pack_sh: int | None = None,
):
    """cv::StereoSGBM selection tail shared by both kernels (the exact
    vector form of ops/sgbm.py::select_disparity_hdw's epilogue):
    truncating integer sub-pixel, minX band, scatter-based pseudo right
    disparity via a descending-d lane-shift walk, floor/ceil dual LR
    check via masked dynamic rolls (positive shifts only — Mosaic
    miscompiles negative dynamic rotates at non-power-of-two vreg
    widths). Returns the final (TH, Wp) disp16 plane."""
    big = jnp.int32(_BIG)
    minD = min_disparity
    minX1 = max(minD + D, 0)
    maxX1 = W + min(minD, 0)
    Wp = db.shape[-1]

    interior = (db > 0) & (db < D - 1)
    denom2 = jnp.maximum(s_m + s_p - 2 * sb, 1)
    num = (s_m - s_p) * 16 + denom2
    # exact C-truncating integer division without an integer divide (the
    # VPU has none): f32 quotient (|num| <= 17*den < 2^26, so the f32
    # estimate is within +-1 of truth even for a reciprocal-based divide)
    # then a one-step correction to the exact floor(|num|/den)
    den = 2 * denom2
    an = jnp.abs(num)
    qa = jnp.trunc(
        an.astype(jnp.float32) / den.astype(jnp.float32)
    ).astype(jnp.int32)
    qa = jnp.where((qa + 1) * den <= an, qa + 1, qa)
    qa = jnp.where(qa * den > an, qa - 1, qa)
    frac = jnp.where(interior, jnp.sign(num) * qa, 0)
    disp16 = (db + minD) * 16 + frac
    in_range = (lane >= minX1) & (lane < maxX1)
    valid0 = in_range & jnp.logical_not(not_unique)
    inv_val = jnp.int32((minD - 1) * 16)
    disp16 = jnp.where(valid0, disp16, inv_val)
    if disp12_max_diff < 0:
        return disp16

    if minD < 0:
        raise NotImplementedError(
            "select kernel supports min_disparity >= 0 (negative needs "
            "negative dynamic rolls — use the XLA select)"
        )
    # disp2 walk: descending d with a running candidate living at lane
    # x = xr + d; each d -> d-1 transition is one left lane shift (BIG
    # entering at lane W-1). RANGE-BOUNDED: every candidate's d is a
    # d_best value of this row tile, so the walk covers only
    # [dmin, dmax] of the tile — natural content spans a fraction of D
    # (the unbounded walk + lookups measured +8 ms at 2K/d=256). With
    # `pack_sh` the candidate is ONE packed key (sb << SH) | db whose
    # min resolves cost ties to the smaller d (identical to the
    # descending `<=` pair walk); without it (no value bound) a
    # (cost, d) pair walks the same loop.
    # range over CANDIDATE pixels only (valid0 — the minX band's garbage
    # argmins would otherwise widen [dmin, dmax] back to ~D)
    dmin = jnp.min(jnp.where(valid0, db, D - 1))
    dmax = jnp.max(jnp.where(valid0, db, 0))
    dmax = jnp.maximum(dmax, dmin)
    UN = 4
    # main loop: UN steps per trip; traced remainder loop finishes the
    # range so the frame always ends exactly at d = dmin >= 0
    n_main = (dmax - dmin + 1) // UN
    n_rem = (dmax - dmin + 1) - n_main * UN

    if pack_sh is not None:
        BIGK = jnp.int32(1 << 30)
        candk = jnp.where(valid0, (sb << pack_sh) | db, BIGK)

        def wsub(d, m):
            m = jnp.where(lane >= W - 1, BIGK, pltpu.roll(m, Wp - 1, axis=1))
            return jnp.minimum(m, jnp.where(db == d, candk, BIGK))

        def wstep(t, m):
            d0 = dmax - t * UN
            for j in range(UN):
                m = wsub(d0 - j, m)
            return m

        mk = jax.lax.fori_loop(0, n_main, wstep, jnp.full_like(db, BIGK))
        mk = jax.lax.fori_loop(
            0, n_rem, lambda t, m: wsub(dmax - n_main * UN - t, m), mk
        )
        # final frame is xr + dmin (+ minD): one dynamic left shift
        sh = dmin + minD
        mk = jnp.where(
            lane >= W - sh, BIGK, pltpu.roll(mk, Wp - sh, axis=1)
        )
        disp2 = jnp.where(
            mk < BIGK, (mk & jnp.int32((1 << pack_sh) - 1)) + minD, minD - 1
        )
    else:
        cand = jnp.where(valid0, sb, big)

        def wsub2(d, carry):
            m2, a2 = carry
            m2 = jnp.where(lane >= W - 1, big, pltpu.roll(m2, Wp - 1, axis=1))
            a2 = pltpu.roll(a2, Wp - 1, axis=1)
            sel = jnp.where(db == d, cand, big)
            take = sel <= m2        # later (smaller) d wins ties
            return jnp.where(take, sel, m2), jnp.where(take, d, a2)

        def wstep2(t, carry):
            d0 = dmax - t * UN
            for j in range(UN):
                carry = wsub2(d0 - j, carry)
            return carry

        init = (jnp.full_like(db, big), jnp.zeros_like(db))
        m2, a2 = jax.lax.fori_loop(0, n_main, wstep2, init)
        m2, a2 = jax.lax.fori_loop(
            0, n_rem, lambda t, c: wsub2(dmax - n_main * UN - t, c), (m2, a2)
        )
        sh = dmin + minD
        m2 = jnp.where(lane >= W - sh, big, pltpu.roll(m2, Wp - sh, axis=1))
        a2 = pltpu.roll(a2, Wp - sh, axis=1)
        disp2 = jnp.where(m2 < big, a2 + minD, minD - 1)

    # floor/ceil dual lookups disp2[x - d]: masked positive dynamic
    # rolls, also range-bounded — d_f/d_c of valid pixels lie in
    # [dmin + minD - 1, dmax + minD + 1]; one dynamic roll per UN values
    # composed with exact static sub-rolls, overrun dd match nothing
    d_f = jnp.right_shift(disp16, 4)
    d_c = jnp.right_shift(disp16 + 15, 4)
    invp = jnp.full_like(db, minD - 1)
    lo_lk = jnp.maximum(dmin + minD - 1, 0)
    n_lk = (dmax + minD + 2 - lo_lk + UN - 1) // UN

    def lstep(g, carry):
        at_f, at_c = carry
        base = pltpu.roll(disp2, lo_lk + g * UN, axis=1)
        for j in range(UN):
            dd = lo_lk + g * UN + j
            r = pltpu.roll(base, j, axis=1)
            at_f = jnp.where(d_f == dd, r, at_f)
            at_c = jnp.where(d_c == dd, r, at_c)
        return at_f, at_c

    at_f, at_c = jax.lax.fori_loop(0, n_lk, lstep, (invp, invp))
    valid = disp16 != inv_val
    lr_bad = (
        valid
        & (lane - d_f >= 0) & (at_f >= minD)
        & (jnp.abs(at_f - d_f) > disp12_max_diff)
        & (lane - d_c >= 0) & (at_c >= minD)
        & (jnp.abs(at_c - d_c) > disp12_max_diff)
    )
    return jnp.where(lr_bad, inv_val, disp16)


def _select_kernel(
    *refs,
    n_parts: int, D: int, DC: int, TH: int, W: int,
    uniqueness_ratio: int, disp12_max_diff: int, min_disparity: int,
):
    parts = refs[:n_parts]
    out_d = refs[n_parts]
    scr = refs[n_parts + 1]      # (8, TH, Wp) int32 running planes:
    # [2]=s_best, [3]=d_best, [4]=s_alt, [5]=s_m, [6]=s_p
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
        scr[2] = jnp.full((TH, Wp), big)
        scr[3] = jnp.zeros((TH, Wp), jnp.int32)
        scr[4] = jnp.full((TH, Wp), big)
        scr[5] = jnp.full((TH, Wp), big)
        scr[6] = jnp.full((TH, Wp), big)

    @pl.when(p == 0)
    def _():
        # this grid step's blocks hold d in [D - (c+1)*DC, D - c*DC)
        # (descending index map); <= ties keep the smaller d (first-min)
        sb = scr[2]
        db = scr[3]
        d0 = D - (c + 1) * DC
        for k in range(DC - 1, -1, -1):
            d_cur = jnp.int32(d0 + k)
            plane = S[:, k, :]
            tb = plane <= sb
            sb = jnp.where(tb, plane, sb)
            db = jnp.where(tb, d_cur, db)
        scr[2] = sb
        scr[3] = db

    @pl.when(p == 1)
    def _():
        sb = scr[2]
        db = scr[3]
        s_alt = scr[4]
        s_m = scr[5]
        s_p = scr[6]
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
        scr[4] = s_alt
        scr[5] = s_m
        scr[6] = s_p

        @pl.when(c == n_dc - 1)
        def _():
            not_unique = (s_alt < big) & (
                s_alt * (100 - uniqueness_ratio) < sb * 100
            )
            out_d[...] = _ocv_select_epilogue(
                db, sb, not_unique, s_m, s_p, lane,
                D=D, W=W, disp12_max_diff=disp12_max_diff,
                min_disparity=min_disparity,
            )


def _select_kernel_1p(
    *refs,
    n_parts: int, D: int, DC: int, TH: int, W: int, SH: int,
    uniqueness_ratio: int, disp12_max_diff: int, min_disparity: int,
):
    """Single-pass variant: every volume-wide quantity rides PACKED keys
    k = (value << SH) | d, so min(k) resolves value ties to the smaller d
    — exactly the first-min rule. The far-set min (uniqueness) comes from a running TOP-4 of
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
    # [1]=best key, [2..5]=top-4 keys, [6]=s_m, [7]=s_p,
    # [8]=pending (0/1), [9]=prev plane
    c = pl.program_id(1)
    n_dc = pl.num_programs(1)
    Wp = out_d.shape[-1]
    BIGK = jnp.int32(1 << 30)

    S = parts[0][...].astype(jnp.int32)
    for k in range(1, n_parts):
        S = S + parts[k][...].astype(jnp.int32)          # (TH, DC, Wp)

    lane = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)

    @pl.when(c == 0)
    def _():
        for i in range(6):
            scr[i] = jnp.full((TH, Wp), BIGK)
        scr[6] = jnp.full((TH, Wp), BIGK)
        scr[7] = jnp.full((TH, Wp), BIGK)
        scr[8] = jnp.zeros((TH, Wp), jnp.int32)
        scr[9] = jnp.zeros((TH, Wp), jnp.int32)

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
        out_d[...] = _ocv_select_epilogue(
            db, sb, not_unique, s_m2, s_p, lane,
            D=D, W=W, disp12_max_diff=disp12_max_diff,
            min_disparity=min_disparity, pack_sh=SH,
        )


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
