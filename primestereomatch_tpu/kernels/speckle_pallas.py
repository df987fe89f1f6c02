"""Pallas TPU kernel for the speckle-filter segmented min-sweeps.

`ops/sgbm.py::filter_speckles` finds connected components by min-label
propagation; each sweep runs four segmented min-scans (rows fwd/bwd,
columns down/up). The XLA `lax.associative_scan` lowering of one sweep
costs ~30 ms at 2K — its odd/even recursion materializes every level of
the (value, flag) pair tree in HBM. This kernel instead keeps the ENTIRE
scan axis resident in VMEM (one block spans the full row/column), runs the
Hillis-Steele doubling in registers, and fuses BOTH scan directions into
one launch that emits their elementwise min — one HBM read + one write per
sweep axis. The grid is over the perpendicular axis only, so every grid
step is independent (no sequential carry at all).

Segmented-scan algebra (identical to the `comb` operator in
`filter_speckles`): state (v, f) with
combine((v1,f1),(v2,f2)) = (f2 ? min(v1,v2) : v2, f1 & f2), identity
(BIG, True). Forward lane i flags f_i = conn[i] ("connected to
predecessor"); the backward direction derives its flags in-kernel as
conn shifted by one (connected(i, i+1) = conn[i+1]) with False at the
axis end — exactly the `conn_rt`/`conn_dn` masks the XLA sweep builds.

Reference context: cv::filterSpeckles semantics (the reference constructs
StereoSGBM with speckle 100/32, src/StereoMatch.cpp:653-655); the CC
algorithm itself is TPU-native, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(1 << 28)
_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _roll(x, sh: int, axis: int):
    if sh < 0:
        sh += x.shape[axis]
    return pltpu.roll(x, sh, axis=axis)


def _segmin_kernel(m_ref, conn_ref, out_ref, *, axis: int, n: int):
    """One block: full scan axis (`axis` of the 2-D block), both
    directions; out = min(fwd segmented min-scan, bwd segmented min-scan).
    `n` = logical length of the scan axis (lanes/sublanes beyond n are
    padding whose conn is False, so they never contaminate valid data)."""
    v0 = m_ref[:]
    # flags ride int32 vectors (1 = connected): Mosaic has no i1 rotates
    conn = (conn_ref[:] != 0).astype(jnp.int32)
    L = v0.shape[axis]
    big = jnp.full_like(v0, _BIG)
    one = jnp.ones_like(conn)

    ix = jax.lax.broadcasted_iota(jnp.int32, v0.shape, axis)

    # the two directions run SEQUENTIALLY (not interleaved) to halve the
    # peak number of live block-sized int32 planes — Mosaic stack-allocates
    # the doubling loop's live set in VMEM

    # forward: flags = conn (connected to predecessor)
    vf, ff = v0, conn
    k = 1
    while k < L:
        # shifted-in identity: (BIG, True)
        vf_s = jnp.where(ix >= k, _roll(vf, k, axis), big)
        ff_s = jnp.where(ix >= k, _roll(ff, k, axis), one)
        vf = jnp.where(ff != 0, jnp.minimum(vf_s, vf), vf)
        ff = ff & ff_s
        k *= 2
    out_ref[:] = vf

    # backward: flags = conn shifted toward lower index (connected to
    # successor); the element entering at the end is False
    fb = jnp.where(ix < n - 1, _roll(conn, -1, axis), 0)
    vb = v0
    k = 1
    while k < L:
        vb_s = jnp.where(ix < L - k, _roll(vb, -k, axis), big)
        fb_s = jnp.where(ix < L - k, _roll(fb, -k, axis), one)
        vb = jnp.where(fb != 0, jnp.minimum(vb_s, vb), vb)
        fb = fb & fb_s
        k *= 2

    out_ref[:] = jnp.minimum(out_ref[:], vb)


@functools.partial(jax.jit, static_argnames=("axis", "interpret"))
def segmin_sweep_pallas(
    m: jax.Array,              # (H, W) int32 hooked labels
    conn: jax.Array,           # (H, W) bool: connected to the axis predecessor
    axis: int,                 # 1 = row scans (lanes), 0 = column scans
    interpret: bool = False,
) -> jax.Array:
    """min(forward, backward) segmented min-scan along `axis`.

    Bit-identical to the XLA formulation in `filter_speckles`' sweep:
    rows: min over the left- and right-propagated segmented mins with
    conn = conn_lf; columns: conn = conn_up.
    """
    H, W = m.shape
    # perpendicular tile size: ~8 block-sized int32 planes are live through
    # a direction's doubling loop (value/flag + their shifted copies +
    # masks), plus the double-buffered I/O blocks
    if axis == 1:
        Wp = _round_up(W, 128)
        n = W
        th = max(8, min(256, _VMEM_BUDGET // max(1, Wp * 4 * 12) // 8 * 8))
        gh = -(-H // th)
        Hp = gh * th
        block = (th, Wp)
        grid = (gh,)
        imap = lambda h: (h, 0)
    else:
        Hp = _round_up(H, 8)
        n = H
        tw = max(128, min(512, _VMEM_BUDGET // max(1, Hp * 4 * 12) // 128 * 128))
        gw = -(-W // tw)
        Wp = gw * tw
        block = (Hp, tw)
        grid = (gw,)
        imap = lambda w: (0, w)

    mp = jnp.pad(m, ((0, Hp - H), (0, Wp - W)))
    cp = jnp.pad(conn, ((0, Hp - H), (0, Wp - W)))  # pad False: no links

    out = pl.pallas_call(
        functools.partial(_segmin_kernel, axis=axis, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, imap),
            pl.BlockSpec(block, imap),
        ],
        out_specs=pl.BlockSpec(block, imap),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), m.dtype),
        interpret=interpret,
    )(mp, cp.astype(jnp.int8))
    return out[:H, :W]
