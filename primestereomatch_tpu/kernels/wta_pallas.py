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


def _wta_kernel(
    row_start_s, col_start_s,                 # SMEM scalar-prefetch tables
    maps_hbm, guide_blk, ryw_blk, cxw_blk, out_ref,
    slab, sem,
    *, n_maps: int, D: int, DC: int, RS: int, CS: int,
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
        rowed = jax.lax.dot_general(
            w_row, cur,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # cols: merge (maps, DC, rows) into the matmul M dimension —
        # batched M=8 matmuls run the MXU at 8/128 row utilization, one
        # (n_maps*DC*8, CS) @ (CS, TW) matmul runs it full
        flat = jnp.transpose(rowed, (1, 2, 0, 3)).reshape(
            n_maps * DC * TILE_H, CS
        )
        q4 = jnp.dot(flat, w_col, preferred_element_type=jnp.float32)
        q4 = q4.reshape(n_maps, DC, TILE_H, TILE_W)
        # combine maps with the guide: (DC, 8, TW)
        q = (
            q4[0] * cr[None]
            + q4[1] * cg[None]
            + q4[2] * cb[None]
            + q4[3]
        )
        d_glob = c * DC + jax.lax.broadcasted_iota(jnp.int32, (DC, 1, 1), 0)
        q = jnp.where(d_glob == 0, jnp.inf, q)
        c_min = jnp.min(q, axis=0)
        c_arg = (c * DC + jnp.argmin(q, axis=0)).astype(jnp.int32)
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
    interpret: bool = False,
) -> jax.Array:
    """WTA from a pre-stacked, pre-padded maps tensor (the layout
    kernels/lowmaps_pallas.py emits) — skips the (4, D, h, w) stack+pad
    copy of the tuple entry point (~700 MB per view at 2K/d=256)."""
    return _fgf_wta_pallas_impl(
        guide, maps, out_hw=out_hw, d_chunk=d_chunk, interpret=interpret,
        logical_hw=logical_hw,
    )


def _fgf_wta_pallas_impl(
    guide, mean_a_r, mean_a_g=None, mean_a_b=None, mean_b=None,
    out_hw=None, d_chunk=32, interpret=False, logical_hw=None,
) -> jax.Array:
    if mean_b is not None:
        maps = jnp.stack([mean_a_r, mean_a_g, mean_a_b, mean_b], axis=0)
        h, w = mean_b.shape[-2:]
    else:
        maps = mean_a_r          # pre-stacked (4, D, HP, WP)
        h, w = logical_hw
    H, W = out_hw
    D = maps.shape[1]
    DC = min(d_chunk, D)
    if D % DC:
        raise ValueError(f"D={D} not divisible by chunk {DC}")
    hp = _round_up(H, TILE_H)
    wp = _round_up(W, TILE_W)
    nty, ntx = hp // TILE_H, wp // TILE_W

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

    col_base = (sx[np.arange(ntx) * TILE_W] // 128) * 128
    span_c = int((sx[np.minimum(np.arange(ntx) * TILE_W + TILE_W - 1, wp - 1)]
                  - col_base).max()) + 2
    CS = _round_up(span_c, 128)
    col_start = col_base.astype(np.int32)

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
    cx_rel = (sx - np.repeat(col_start, TILE_W)).astype(np.float32)

    guide_p = jnp.pad(
        jnp.moveaxis(guide, -1, 0), ((0, 0), (0, hp - H), (0, wp - W))
    )

    # packed per-tile tables (blocked VMEM inputs)
    ryw = np.zeros((nty, TILE_H, TILE_W), np.float32)
    ryw[:, :, 0] = ry_rel.reshape(nty, TILE_H)
    ryw[:, :, 1] = fy.reshape(nty, TILE_H)
    CW = max(CS, TILE_W)
    cxw = np.zeros((ntx, 16, CW), np.float32)
    cxw[:, 0, :TILE_W] = cx_rel.reshape(ntx, TILE_W)
    cxw[:, 1, :TILE_W] = fx.reshape(ntx, TILE_W)

    kernel = functools.partial(
        _wta_kernel, n_maps=4, D=D, DC=DC, RS=RS, CS=CS,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                       # maps
            pl.BlockSpec((3, TILE_H, TILE_W), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, 16, CW), lambda i, j, *_: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j)),
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
