"""Pallas TPU kernel: joint weighted-median filter (the PP hot stage).

Same contract as ops/jointwmf.py::joint_wmf (mode 'exact'), which itself
re-expresses the reference's CVPR'14 sliding joint histogram
(include/JointWMF.h:173-408) as dense tensor math. The jnp version streams
a (n_bins, H, W) histogram through HBM on every one of the (2r+1)^2 window
offsets; this kernel keeps everything resident in VMEM per pixel tile and
replaces the 64-bin one-hot accumulation with a weighted-median *binary
search* over the bin axis:

  pass 1: for each window offset, compute the bilateral weight
          w = exp(-(|dc|^2/(2 sig^2))) once (times `valid` only when a
          participation plane is given — the library default has none,
          and out-of-image exclusion then comes free from the _BORDER_C
          guide padding whose weight underflows to exactly +0.0), cache
          (w, d) in VMEM scratch, and accumulate the total weight;
  pass 2: bounded lower_bound over the monotone cum(b) via _NWAY-way
          probes: each (w, d) re-read decides log2(_NWAY) binary levels
          (bit-identical to binary search; see the probe loop).

Work per pixel drops from O(win^2 * n_bins) to O(win^2 * (1 + log2 n_bins))
and the histogram tensor never exists. Numerics: identical weights; the
cumulative sums are accumulated in a different order than the jnp
histogram+cumsum, so knife-edge median ties can differ in the last float
ulp (validated to agree on >99.9% of pixels; the library default keeps the
jnp path on CPU and uses this kernel on TPU — models/gif_pipeline.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32   # v5e sweep (2K/256 bins, valid-less): th=16 23.6, th=32 22.6
              # ms/view wall (halo+hoist amortization); th=48 exceeds VMEM
TILE_W = 128
# tuning hooks (see sweep notes in the module docstring)
_DBUF_DT = None      # None = int16; jnp.int32 fallback for wide ranges
_PROBE_B = None      # offsets per pass-2 reduce trip (None = win)
_FUSE_T1 = False     # fold the FIRST K-way probe trip into pass 1 (its mids
                     # depend only on (dmn, width0), known before the sweep),
                     # deleting one (wbuf, dbuf) re-read sweep. MEASURED
                     # NEGATIVE on v5e (round 5): 2K WMF 30.5 -> 34.3
                     # ms/frame — natural-content tiles span few trips, so
                     # the unconditional +9 ops/offset in pass 1 outweigh
                     # the saved sweep. Kept as a flag: re-evaluate on
                     # content with wide per-tile disparity ranges.
_NWAY = 4            # K-way search fan-out per (wbuf, dbuf) sweep: each trip
                     # decides log2(K) binary levels from ONE re-read of the
                     # cached (w, d) pairs — bit-identical to binary (K=2;
                     # the probed mids are a superset of binary's, each cum
                     # summed in the same block order, and same-order float
                     # sums of pointwise-dominated terms stay monotone).
                     # Measured v5e 2K/256-bin: worst-case random disparity
                     # 28.5 (K=2) -> 27.4 (K=4) ms/view; smooth fields are
                     # unchanged (~24.2) — pass 1 dominates this kernel.
# extended (haloed) tile dims rounded up to the f32 VMEM tiling (8, 128):
# HBM->VMEM DMA slice shapes must be tile-aligned
def _ext_dims(radius: int, tile_h: int = TILE_H) -> tuple[int, int]:
    eh = tile_h + 2 * radius
    ew = TILE_W + 2 * radius
    return (-(-eh // 8) * 8, -(-ew // 128) * 128)


def _wmf_kernel(
    disp_hbm, c6_hbm, valid_hbm, out_ref,
    dtile, ctile, vtile, dshift, cshift, vshift, wbuf, dbuf, sems,
    *, radius: int, n_bins: int, inv_two_sig2: float, has_valid: bool,
    tile_h: int,
):
    r = radius
    win = 2 * r + 1
    noff = win * win
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    TILE_H = tile_h

    eh, ew = _ext_dims(r, tile_h)
    cp_d = pltpu.make_async_copy(
        disp_hbm.at[b, pl.ds(i * TILE_H, eh), pl.ds(j * TILE_W, ew)],
        dtile, sems.at[0],
    )
    cp_c = pltpu.make_async_copy(
        c6_hbm.at[b, :, pl.ds(i * TILE_H, eh), pl.ds(j * TILE_W, ew)],
        ctile, sems.at[1],
    )
    cp_d.start()
    cp_c.start()
    if has_valid:
        cp_v = pltpu.make_async_copy(
            valid_hbm.at[b, pl.ds(i * TILE_H, eh), pl.ds(j * TILE_W, ew)],
            vtile, sems.at[2],
        )
        cp_v.start()
    cp_d.wait()
    cp_c.wait()
    if has_valid:
        cp_v.wait()

    # hoist the expensive lane (column) shifts out of the window sweep:
    # one relayout per column offset instead of one per (row, col) offset
    for ox in range(win):
        dshift[ox] = dtile[:, ox : ox + TILE_W]
        cshift[ox] = ctile[:, :, ox : ox + TILE_W]
        if has_valid:
            vshift[ox] = vtile[:, ox : ox + TILE_W]

    center = cshift[r][:, r : r + TILE_H, :]                 # (3, TH, TW)

    # pass 1: window sweep; only cheap sublane (row) slices remain inside.
    # disparities are stored int16 (exact for n_bins <= 256): the binary-
    # search probes re-read dbuf log2(n_bins) times, so halving its
    # footprint cuts the dominant pass-2 VMEM traffic (int8 would halve it
    # again but this Mosaic target has no int8 vector compare).
    # has_valid=False (the library default — the GIF pipeline passes no
    # participation weights) drops the valid plane's DMA, hoist shifts,
    # per-offset slice and multiply from the sweep entirely.
    # FUSED FIRST PROBE TRIP: the first K-way trip's mids depend only on
    # (dmn, width0), both computable from dtile BEFORE the sweep — so its
    # NWAY-1 cums accumulate INSIDE pass 1, deleting one full
    # (wbuf, dbuf) re-read sweep (the dominant pass-2 cost; on tiles
    # whose disparity range fits one trip, pass 2 disappears entirely).
    # The fused cums accumulate one offset at a time while the re-read
    # trips sum pb-offset blocks, so knife-edge median ties can move
    # within the documented last-ulp tolerance class.
    if _FUSE_T1:
        dmn = jnp.min(dtile[...])
        dmx = jnp.max(dtile[...])
        rng = dmx - dmn + 1
        width0 = jax.lax.while_loop(
            lambda w: w < rng, lambda w: w * _NWAY, jnp.int32(1)
        )
        w1 = width0 // _NWAY
        mids1 = [dmn + (j + 1) * w1 - 1 for j in range(_NWAY - 1)]
        cums1 = [
            jnp.zeros((TILE_H, TILE_W), jnp.float32)
            for _ in range(_NWAY - 1)
        ]

    total = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for oy in range(win):
        for ox in range(win):
            o = oy * win + ox
            dq = dshift[ox][oy : oy + TILE_H, :]
            cq = cshift[ox][:, oy : oy + TILE_H, :]
            diff = center - cq
            dist2 = diff[0] * diff[0] + diff[1] * diff[1] + diff[2] * diff[2]
            w = jnp.exp(-dist2 * inv_two_sig2)
            if has_valid:
                w = w * vshift[ox][oy : oy + TILE_H, :]
            wbuf[o] = w
            dbuf[o] = dq.astype(dbuf.dtype)
            total = total + w
            if _FUSE_T1:
                dq32 = dq.astype(jnp.int32)
                cums1 = [
                    c + jnp.where(dq32 <= mid, w, 0.0)
                    for c, mid in zip(cums1, mids1)
                ]
    half = total * 0.5

    # lower_bound over the monotone cum(b): smallest b with cum(b) >= half.
    # BOUNDED search: most tiles span far fewer than n_bins disparity
    # levels, so the search starts at the tile's min and its width covers
    # only the tile's range — ceil(log2(range)) probes instead of
    # log2(n_bins). Bit-identical results: cum is exactly monotone in mid
    # (nonnegative weights), every probed mid's float sum runs in the same
    # offset order, and the invariant cum(ans-1) < half <= cum(ans+width-1)
    # holds from the start (cum(dmn-1) = 0, cum(dmx) = total). The bounds
    # may be loose (halo rows/zero padding lanes enter the min) — loose
    # bounds only add probes, never change the answer.
    #
    # K-WAY probes: each (wbuf, dbuf) sweep evaluates the cums at the
    # NWAY-1 mids `ans + j*width/NWAY - 1` — exactly the mids the binary
    # descent would probe over its next log2(NWAY) steps, summed in the
    # same block order, so the result is BIT-IDENTICAL to binary search
    # while the dominant pass-2 VMEM re-read traffic drops log2(NWAY)x
    # (each trip: 1 read serves log2(NWAY) decisions). Monotonicity of
    # same-order float sums of pointwise-dominated terms (w >= 0) makes
    # the quadrant count sum_j [cum_j < half] reproduce the binary path.
    if not _FUSE_T1:
        dmn = jnp.min(dtile[...])
        dmx = jnp.max(dtile[...])
        rng = dmx - dmn + 1
        # width0 = NWAY^k >= rng, so every K-way trip divides evenly and
        # the final width hits exactly 1
        width0 = jax.lax.while_loop(
            lambda w: w < rng, lambda w: w * _NWAY, jnp.int32(1)
        )

    pb = _PROBE_B or win
    nb = (win * win) // pb
    rem = win * win - nb * pb

    def probe_body(carry):
        width, ans = carry
        width = width // _NWAY
        # mids[j] = ans + (j+1)*width - 1, j = 0..NWAY-2  (monotone)
        mids = [(ans + ((j + 1) * width - 1))[None] for j in range(_NWAY - 1)]

        def cum_body(b, accs):
            wblk = wbuf[pl.ds(b * pb, pb)]
            dblk = dbuf[pl.ds(b * pb, pb)].astype(jnp.int32)
            return tuple(
                acc + jnp.sum(jnp.where(dblk <= mid, wblk, 0.0), axis=0)
                for acc, mid in zip(accs, mids)
            )

        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        cums = jax.lax.fori_loop(
            0, nb, cum_body, tuple(zero for _ in range(_NWAY - 1))
        )
        if rem:
            wblk = wbuf[pl.ds(nb * pb, rem)]
            dblk = dbuf[pl.ds(nb * pb, rem)].astype(jnp.int32)
            cums = tuple(
                c + jnp.sum(jnp.where(dblk <= mid, wblk, 0.0), axis=0)
                for c, mid in zip(cums, mids)
            )
        step = zero.astype(jnp.int32)
        for c in cums:
            step = step + jnp.where(c < half, width, 0)
        return width, ans + step

    if _FUSE_T1:
        # consume the fused first trip: same quadrant-count step as
        # probe_body, then continue the descent from (w1, ans1)
        ans0 = jnp.full((TILE_H, TILE_W), dmn, jnp.int32)
        step = jnp.zeros((TILE_H, TILE_W), jnp.int32)
        for c in cums1:
            step = step + jnp.where(c < half, w1, 0)
        carry0 = (w1, ans0 + step)
    else:
        carry0 = (width0, jnp.full((TILE_H, TILE_W), dmn, jnp.int32))
    _, ans = jax.lax.while_loop(lambda c: c[0] > 1, probe_body, carry0)

    ans = jnp.clip(ans, 0, n_bins - 1)
    if has_valid:
        out_ref[0] = jnp.where(total > 0, ans, 0)
    else:
        out_ref[0] = ans          # exp > 0 everywhere => total > 0 always


def _pad_to(x: jax.Array, h: int, w: int, axes=(0, 1), value=0.0) -> jax.Array:
    pads = [(0, 0)] * x.ndim
    pads[axes[0]] = (0, h - x.shape[axes[0]])
    pads[axes[1]] = (0, w - x.shape[axes[1]])
    return jnp.pad(x, pads, constant_values=value)


# out-of-image guide fill for the valid-less fast path: dist2 >= ~1e12, so
# exp(-dist2 * inv_two_sig2) underflows to exactly +0.0 (f32 exp underflows
# below ~-104) — bitwise the same exclusion the all-ones valid plane's
# zero padding produced, with no per-offset valid work at all. Requires
# inv_two_sig2 * 1e12 > 104, i.e. sig_q < ~7e4 (reference sigma is 25.5).
_BORDER_C = 1.0e6


def _wmf_pallas_batched(
    disp: jax.Array,     # (B, H, W) any int dtype
    guide_u8: jax.Array, # (B, H, W, 3) uint8
    valid: jax.Array | None,  # (B, H, W) float32, or None (all-ones fast path)
    radius: int, n_bins: int, sigma: float, interpret: bool,
    tile_h: int | None = None,
) -> jax.Array:
    """(B, H, W) batched kernel launch: batch is the leading grid dim, so
    jax.vmap of the public API lowers to ONE pallas_call."""
    B, H, W = disp.shape
    r = radius
    has_valid = valid is not None
    th = tile_h or TILE_H
    hp = pl.cdiv(H, th) * th
    wp = pl.cdiv(W, TILE_W) * TILE_W

    # 6-bit quantization + rescaled sigma (include/JointWMF.h:546,622)
    c6 = jnp.right_shift(guide_u8.astype(jnp.int32), 2).astype(jnp.float32)
    c6 = jnp.moveaxis(c6, -1, 1)                    # (B, 3, H, W)
    sig_q = sigma / 256.0 * 64.0
    inv_two_sig2 = 1.0 / (2.0 * sig_q * sig_q)

    # halo padding folded into one padded layout. Out-of-image exclusion:
    # with a valid plane, padding valid with 0 does it; on the valid-less
    # fast path the guide pads with _BORDER_C instead, making the bilateral
    # weight underflow to exactly +0.0 for every out-of-image sample — the
    # bitwise-same exclusion with no per-offset valid work. bottom/right
    # padded further so every tile's aligned (eh, ew) DMA window stays
    # in bounds
    if not has_valid and float(inv_two_sig2) * (_BORDER_C ** 2) < 120.0:
        # absurdly large sigma: underflow trick invalid; fall back
        valid = jnp.ones((B, H, W), jnp.float32)
        has_valid = True
    eh, ew = _ext_dims(r, th)
    pad_b = (hp - th + eh) - (hp + r)
    pad_r = (wp - TILE_W + ew) - (wp + r)
    d_pad = jnp.pad(
        _pad_to(disp.astype(jnp.int32), hp, wp, axes=(1, 2)),
        ((0, 0), (r, pad_b), (r, pad_r)),
    )
    if has_valid:
        v_pad = jnp.pad(
            _pad_to(valid.astype(jnp.float32), hp, wp, axes=(1, 2)),
            ((0, 0), (r, pad_b), (r, pad_r)),
        )
        c_fill = 0.0
    else:
        v_pad = jnp.zeros((1, 8, 128), jnp.float32)   # placeholder, unread
        c_fill = _BORDER_C
    c_pad = jnp.pad(
        _pad_to(c6, hp, wp, axes=(2, 3), value=c_fill),
        ((0, 0), (0, 0), (r, pad_b), (r, pad_r)), constant_values=c_fill,
    )

    kernel = functools.partial(
        _wmf_kernel, radius=r, n_bins=n_bins,
        inv_two_sig2=float(inv_two_sig2), has_valid=has_valid, tile_h=th,
    )
    win = 2 * r + 1
    eh_ew = (eh, ew)
    out = pl.pallas_call(
        kernel,
        grid=(B, hp // th, wp // TILE_W),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, th, TILE_W), lambda b, i, j: (b, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, hp, wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM(eh_ew, jnp.int32),
            pltpu.VMEM((3, *eh_ew), jnp.float32),
            pltpu.VMEM(eh_ew if has_valid else (8, 128), jnp.float32),
            pltpu.VMEM((win, eh, TILE_W), jnp.int32),             # dshift
            pltpu.VMEM((win, 3, eh, TILE_W), jnp.float32),        # cshift
            pltpu.VMEM(                                           # vshift
                (win, eh, TILE_W) if has_valid else (1, 8, 128),
                jnp.float32,
            ),
            pltpu.VMEM((win * win, th, TILE_W), jnp.float32),
            pltpu.VMEM((win * win, th, TILE_W), _DBUF_DT or jnp.int16),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(d_pad, c_pad, v_pad)
    return out[:, :H, :W].astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("radius", "n_bins", "sigma", "tile_h",
                              "interpret")
)
def joint_wmf_pallas(
    disp: jax.Array,                # (H, W) uint8
    guide_u8: jax.Array,            # (H, W, 3) uint8
    radius: int = 9,
    n_bins: int = 64,
    sigma: float = 25.5,
    valid: jax.Array | None = None,  # (H, W) float32 participation weights
    tile_h: int | None = None,       # rows per tile (None = default TILE_H, 32)
    interpret: bool = False,
) -> jax.Array:
    """Drop-in accelerated joint_wmf (mode 'exact'). Returns (H, W) uint8.

    valid=None (the library default) takes the fast path: no valid-plane
    DMA/shift/multiply; border exclusion comes from the _BORDER_C guide
    padding instead (bitwise-identical medians).

    vmap-able: a custom batching rule maps the whole batch onto one
    pallas_call with batch as the leading grid dimension."""
    if valid is None:

        @jax.custom_batching.custom_vmap
        def run2(d, g):
            return _wmf_pallas_batched(
                d[None], g[None], None, radius, n_bins, sigma, interpret,
                tile_h=tile_h,
            )[0]

        @run2.def_vmap
        def _run2_vmap(axis_size, in_batched, d, g):  # noqa: ANN001
            db, gb = in_batched

            def bcast(x, batched):
                return x if batched else jnp.broadcast_to(
                    x, (axis_size, *x.shape)
                )

            out = _wmf_pallas_batched(
                bcast(d, db), bcast(g, gb), None, radius, n_bins, sigma,
                interpret, tile_h=tile_h,
            )
            return out, True

        return run2(disp, guide_u8)

    @jax.custom_batching.custom_vmap
    def run(d, g, v):
        return _wmf_pallas_batched(
            d[None], g[None], v[None], radius, n_bins, sigma, interpret,
            tile_h=tile_h,
        )[0]

    @run.def_vmap
    def _run_vmap(axis_size, in_batched, d, g, v):  # noqa: ANN001
        db, gb, vb = in_batched

        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(x, (axis_size, *x.shape))

        out = _wmf_pallas_batched(
            bcast(d, db), bcast(g, gb), bcast(v, vb),
            radius, n_bins, sigma, interpret,
        )
        return out, True

    return run(disp, guide_u8, valid)
