"""Guided image filtering of the cost volume (CVF stage).

Two variants matching the reference's capability surface:

  * `fast_guided_filter_color` — the ACTIVE golden path
    (src/fastguidedfilter.cpp, vendored from Sundrops/fast-guided-filter,
    arXiv 1505.00996): guide + each cost slice nearest-downsampled by s,
    radius rescaled to 2*(r/s)+1, closed-form color GIF solved at low
    resolution via a precomputed inverse covariance, (a, b) box-averaged,
    bilinearly upsampled, applied at full resolution.

  * `guided_filter_color` — full-resolution color GIF (the dead CPU CVF path
    src/CVF.cpp:72-165 and the OpenCL CVF_cl decomposition, which use a
    direct 3x3 symmetric solve per pixel with eps on the diagonal).

TPU-first design: the D cost slices share one guide, so all guide statistics
are computed once at (h, w) and broadcast; the per-slice math is pure
batched elementwise + box filters over a (D, h, w) tensor, which XLA fuses
aggressively. Everything is float32 with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from primestereomatch_tpu.ops.boxfilter import box_mean
from primestereomatch_tpu.ops.resize import (
    linear_coeffs,
    resize_nearest,
    resize_bilinear,
    resize_bilinear_mxu,
)


def _color_inverse_cov(ch, k: int, eps: float):
    """Per-pixel inverse of the 3x3 color covariance (+eps*I), adjugate/det.

    Mirrors the algebra of src/fastguidedfilter.cpp:135-166 (also
    src/CVF.cpp:120-147, assets/cvf.cl:262-327).
    Returns (means, inv) where inv = (rr, rg, rb, gg, gb, bb).
    """
    m = [box_mean(c, k) for c in ch]
    v_rr = box_mean(ch[0] * ch[0], k) - m[0] * m[0] + eps
    v_rg = box_mean(ch[0] * ch[1], k) - m[0] * m[1]
    v_rb = box_mean(ch[0] * ch[2], k) - m[0] * m[2]
    v_gg = box_mean(ch[1] * ch[1], k) - m[1] * m[1] + eps
    v_gb = box_mean(ch[1] * ch[2], k) - m[1] * m[2]
    v_bb = box_mean(ch[2] * ch[2], k) - m[2] * m[2] + eps

    inv_rr = v_gg * v_bb - v_gb * v_gb
    inv_rg = v_gb * v_rb - v_rg * v_bb
    inv_rb = v_rg * v_gb - v_gg * v_rb
    inv_gg = v_rr * v_bb - v_rb * v_rb
    inv_gb = v_rb * v_rg - v_rr * v_gb
    inv_bb = v_rr * v_gg - v_rg * v_rg

    det = inv_rr * v_rr + inv_rg * v_rg + inv_rb * v_rb
    inv = tuple(t / det for t in (inv_rr, inv_rg, inv_rb, inv_gg, inv_gb, inv_bb))
    return m, inv


def _solve_ab(p, ch_low, means, inv, k: int):
    """Low-res GIF solve for one batch of slices p (D, h, w)."""
    mean_p = box_mean(p, k)
    cov = []
    for c in range(3):
        mean_ip = box_mean(ch_low[c][None] * p, k)
        cov.append(mean_ip - means[c][None] * mean_p)
    inv_rr, inv_rg, inv_rb, inv_gg, inv_gb, inv_bb = inv
    a_r = inv_rr[None] * cov[0] + inv_rg[None] * cov[1] + inv_rb[None] * cov[2]
    a_g = inv_rg[None] * cov[0] + inv_gg[None] * cov[1] + inv_gb[None] * cov[2]
    a_b = inv_rb[None] * cov[0] + inv_gb[None] * cov[1] + inv_bb[None] * cov[2]
    b = mean_p - a_r * means[0][None] - a_g * means[1][None] - a_b * means[2][None]
    return (a_r, a_g, a_b), b


def fast_guided_filter_color(
    guide: jax.Array,          # (H, W, 3) float32 full-res guide
    p: jax.Array,              # (D, H, W) float32 cost volume
    radius: int = 8,
    eps: float = 1e-4,
    subsample: int = 4,
    upsample_impl: str = "lerp",
) -> jax.Array:
    """FastGuidedFilter(I, r, eps, s).filter(p) for every slice of p.

    Matches src/fastguidedfilter.cpp:121-198 with the reference call site's
    parameters (src/DispEst.cpp:281-295): r=GIF_R_WIN=8, eps=1e-4,
    s=subsample_rate; the effective low-res box size is 2*(r/s)+1.
    """
    H, W, _ = guide.shape
    h, w = H // subsample, W // subsample
    p_low = resize_nearest(p, (h, w))
    return fast_guided_filter_color_low(
        guide, p_low, radius, eps, subsample, upsample_impl
    )


def fgf_low_maps(
    guide: jax.Array,          # (H, W, 3) float32 full-res guide
    p_low: jax.Array,          # (D, H//s, W//s) subsampled cost volume
    radius: int = 8,
    eps: float = 1e-4,
    subsample: int = 4,
):
    """Low-resolution half of the FastGuidedFilter: guide statistics +
    per-slice (a, b) solve + box averaging. Returns (mean_a 3-tuple,
    mean_b), each (D, h, w) — the inputs to the upsample/apply step
    (`fast_guided_filter_color_low`) or the fused WTA (`fgf_wta_low_maps`)."""
    h, w = p_low.shape[-2:]
    k = 2 * (radius // subsample) + 1
    ch_low = tuple(
        resize_nearest(guide[..., c], (h, w)) for c in range(3)
    )
    means, inv = _color_inverse_cov(ch_low, k, eps)
    (a_r, a_g, a_b), b = _solve_ab(p_low, ch_low, means, inv, k)
    mean_a = tuple(box_mean(a, k) for a in (a_r, a_g, a_b))
    return mean_a, box_mean(b, k)


def fast_guided_filter_color_low(
    guide: jax.Array,          # (H, W, 3) float32 full-res guide
    p_low: jax.Array,          # (D, H//s, W//s) ALREADY-subsampled volume
    radius: int = 8,
    eps: float = 1e-4,
    subsample: int = 4,
    upsample_impl: str = "lerp",
) -> jax.Array:
    """FGF taking the nearest-downsampled volume directly — lets callers
    (models/gif_pipeline.py) build cost only at the sample grid
    (ops/cost_volume.py::build_cost_volumes_sampled) so the full-res cost
    volume never exists. upsample_impl: 'lerp' (gather lerp, bit-matches
    the CPU golden path) or 'mxu' (banded-matrix matmuls, TPU fast path —
    see ops/resize.py::resize_bilinear_mxu)."""
    H, W, _ = guide.shape
    mean_a, mean_b = fgf_low_maps(guide, p_low, radius, eps, subsample)
    up_fn = resize_bilinear_mxu if upsample_impl == "mxu" else resize_bilinear
    up = lambda t: up_fn(t, (H, W))
    q = (
        up(mean_a[0]) * guide[..., 0][None]
        + up(mean_a[1]) * guide[..., 1][None]
        + up(mean_a[2]) * guide[..., 2][None]
        + up(mean_b)
    )
    return q


def _upsample_tile(
    t: jax.Array,          # (D, hl, wl) low-res rows of an EXTENDED tile
    out_hw: tuple[int, int],
    s: int,
    halo: int,             # full-res halo rows on each side of the tile
    glow: int,             # number of low-res rows in the GLOBAL image
    is_top: jax.Array,     # traced bool: this tile touches the global top
    is_bot: jax.Array,     # traced bool: this tile touches the global bottom
) -> jax.Array:
    """Bilinear upsample of a row-tile with OpenCV INTER_LINEAR clamping
    applied at the GLOBAL image borders (not the tile borders).

    The tile's low-res rows sit on the global low-res grid (requires
    halo % s == 0 and tile offset % s == 0). OpenCV clamps the source
    coordinate at global rows 0 and glow-1 (ops/resize.py:linear_coeffs);
    here those rows live at local indices halo/s and hl-1-halo/s for
    edge tiles, selected with traced edge flags so one SPMD program serves
    every shard. Columns are globally unsharded -> static coeffs.
    """
    D, hl, wl = t.shape
    He, W = out_hw
    hs = halo // s

    # rows: traced coeffs (fy is exact in f32 for power-of-two s)
    Y = jnp.arange(He, dtype=jnp.float32)
    fy = (Y + 0.5) * (1.0 / s) - 0.5
    sy = jnp.floor(fy).astype(jnp.int32)
    fr = fy - sy.astype(jnp.float32)
    # global top clamp: global source row < 0  <=>  sy < hs
    top_clamp = is_top & (sy < hs)
    sy = jnp.where(top_clamp, hs, sy)
    fr = jnp.where(top_clamp, 0.0, fr)
    # global bottom clamp: global source row >= glow-1
    last_local = hl - 1 - hs
    bot_clamp = is_bot & (sy >= last_local)
    sy = jnp.where(bot_clamp, last_local, sy)
    fr = jnp.where(bot_clamp, 0.0, fr)
    sy = jnp.clip(sy, 0, hl - 1)
    sy1 = jnp.minimum(sy + 1, hl - 1)

    rows0 = jnp.take(t, sy, axis=1)
    rows1 = jnp.take(t, sy1, axis=1)
    ry = rows0 * (1.0 - fr)[None, :, None] + rows1 * fr[None, :, None]

    # columns: static OpenCV coeffs (full global width)
    xi, xf = linear_coeffs(wl, W)
    xi = jnp.asarray(xi)
    xi1 = jnp.minimum(xi + 1, wl - 1)
    xfj = jnp.asarray(xf)[None, None, :]
    c0 = ry[..., xi]
    c1 = ry[..., xi1]
    return c0 * (1.0 - xfj) + c1 * xfj


def fgf_tile_halo(radius: int, subsample: int) -> int:
    """Full-res halo rows each side needed for an exact FGF on a row tile:
    two box passes of radius k//2 at low res + 1 low row of bilinear
    support, rounded up to a multiple of s."""
    k = 2 * (radius // subsample) + 1
    return subsample * (2 * (k // 2) + 2)


def fast_guided_filter_color_tile(
    guide_ext: jax.Array,      # (He, W, 3) row tile EXTENDED by halo each side
    p_ext: jax.Array,          # (D, He, W) cost block on the extended tile
    radius: int,
    eps: float,
    subsample: int,
    halo: int,                 # = fgf_tile_halo(radius, subsample)
    global_h: int,             # full (unsharded) image height
    is_top: jax.Array,         # traced bool flags (see _upsample_tile)
    is_bot: jax.Array,
) -> jax.Array:
    """FGF on one row tile of a y-sharded image; returns the filtered
    EXTENDED tile (crop rows [halo:halo+tile_h] for the valid interior).

    Exactness argument (vs the unsharded `fast_guided_filter_color`):
    with tile offset, halo, H and W all multiples of s, the tile's
    nearest-downsample grid coincides with the global grid; s-row
    BLOCK-reflect-101 at the global edges (parallel/sharded.py::
    halo_exchange_rows, block=s) downsamples to exactly the low-res
    reflect-101 the global box passes would see; and `_upsample_tile`
    applies the global-border clamp. Interior outputs are therefore
    identical to the unsharded path (bitwise, for power-of-two s —
    verified in tests/test_parallel.py).
    """
    h, w = p_ext.shape[-2] // subsample, p_ext.shape[-1] // subsample
    p_low = resize_nearest(p_ext, (h, w))
    return fast_guided_filter_color_tile_low(
        guide_ext, p_low, radius, eps, subsample, halo, global_h,
        is_top, is_bot,
    )


def fast_guided_filter_color_tile_low(
    guide_ext: jax.Array,      # (He, W, 3) extended row tile
    p_low: jax.Array,          # (D, He//s, W//s) cost block at the sample grid
    radius: int,
    eps: float,
    subsample: int,
    halo: int,
    global_h: int,
    is_top: jax.Array,
    is_bot: jax.Array,
) -> jax.Array:
    """Tile FGF taking the ALREADY-subsampled cost block (the sharded
    analog of `fast_guided_filter_color_low` — pairs with
    ops/cost_volume.py::build_cost_volume_block_sampled so the sharded
    pipeline never builds full-resolution cost tiles either)."""
    He, W, _ = guide_ext.shape
    s = subsample
    if He % s or W % s or halo % s:
        raise ValueError(f"tile dims must be multiples of s={s}: {He}x{W}, halo={halo}")
    h, w = He // s, W // s
    k = 2 * (radius // subsample) + 1

    ch_full = tuple(guide_ext[..., c] for c in range(3))
    ch_low = tuple(resize_nearest(c, (h, w)) for c in ch_full)
    means, inv = _color_inverse_cov(ch_low, k, eps)

    (a_r, a_g, a_b), b = _solve_ab(p_low, ch_low, means, inv, k)

    mean_a = [box_mean(a, k) for a in (a_r, a_g, a_b)]
    mean_b = box_mean(b, k)

    glow = global_h // s
    up = lambda t: _upsample_tile(t, (He, W), s, halo, glow, is_top, is_bot)
    return (
        up(mean_a[0]) * ch_full[0][None]
        + up(mean_a[1]) * ch_full[1][None]
        + up(mean_a[2]) * ch_full[2][None]
        + up(mean_b)
    )


def fgf_wta_tile_low(
    guide_ext: jax.Array,      # (He, W, 3) extended row tile
    p_low: jax.Array,          # (Db, He//s, W//s) LOCAL d-block at sample grid
    radius: int,
    eps: float,
    subsample: int,
    halo: int,
    global_h: int,
    is_top: jax.Array,
    is_bot: jax.Array,
    d0: jax.Array,             # traced int32: global disparity of p_low[0]
    interior: tuple[int, int], # (row_start, n_rows) full-res crop of the fold
    d_chunk: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Fused FGF + upsample + local WTA on a row tile: the sharded analog
    of `fgf_wta_low_maps` (parallel/sharded.py's match path). Computes the
    low-res (a, b) chain like `fast_guided_filter_color_tile_low`, then
    folds q = up(mean_a)·I + up(mean_b) over d-chunks into a running
    (min, argmin) on the interior rows only — the filtered full-res tile
    (D_block, He, W) never materializes (at 2K/d=256 with y=2 shards that
    tensor is ~1.5 GB per view per shard).

    Global disparity d0 + local == 0 never wins (reference WTA starts at
    d=1, src/DispSel.cpp:96-103); ties keep the lowest disparity (strict-<
    fold + first-min in-chunk argmin). Returns (min_cost f32, global
    argmin int32), both (n_rows, W) — bitwise identical to filtering the
    tile with `fast_guided_filter_color_tile_low`, masking d==0 and
    min/argmin-ing (verified in tests/test_parallel.py).
    """
    He, W, _ = guide_ext.shape
    s = subsample
    h, w = He // s, W // s
    k = 2 * (radius // subsample) + 1

    ch_full = tuple(guide_ext[..., c] for c in range(3))
    ch_low = tuple(resize_nearest(c, (h, w)) for c in ch_full)
    means, inv = _color_inverse_cov(ch_low, k, eps)
    (a_r, a_g, a_b), b = _solve_ab(p_low, ch_low, means, inv, k)
    mean_a = [box_mean(a, k) for a in (a_r, a_g, a_b)]
    mean_b = box_mean(b, k)

    glow = global_h // s
    r0, nr = interior
    crop = lambda t: lax.slice_in_dim(t, r0, r0 + nr, axis=-2)
    up = lambda t: crop(
        _upsample_tile(t, (He, W), s, halo, glow, is_top, is_bot)
    )
    chf = tuple(crop(c) for c in ch_full)

    stack = jnp.stack([*mean_a, mean_b], axis=0)   # (4, Db, h, w)
    Db = stack.shape[1]
    if Db % d_chunk:
        d_chunk = Db
    n_chunks = Db // d_chunk
    chunks = jnp.moveaxis(
        stack.reshape(4, n_chunks, d_chunk, h, w), 1, 0
    )                                              # (n_chunks, 4, dc, h, w)
    inf = jnp.float32(jnp.inf)

    def body(carry, blk):
        best, arg, dl = carry                      # dl: local d of blk[,:0]
        q = (
            up(blk[0]) * chf[0][None]
            + up(blk[1]) * chf[1][None]
            + up(blk[2]) * chf[2][None]
            + up(blk[3])
        )
        d_glob = d0 + dl + jnp.arange(d_chunk, dtype=jnp.int32)
        q = jnp.where((d_glob == 0)[:, None, None], inf, q)
        c_min = jnp.min(q, axis=0)
        c_arg = d_glob[0] + jnp.argmin(q, axis=0).astype(jnp.int32)
        take = c_min < best                        # strict: earlier d wins ties
        best = jnp.where(take, c_min, best)
        arg = jnp.where(take, c_arg, arg)
        return (best, arg, dl + d_chunk), None

    init = (
        jnp.full((nr, W), inf, jnp.float32),
        jnp.zeros((nr, W), jnp.int32),
        jnp.int32(0),
    )
    (best, arg, _), _ = lax.scan(body, init, chunks)
    return best, arg


def fgf_wta_low_maps(
    guide: jax.Array,          # (H, W, 3) full-res guide
    mean_a: tuple,             # 3 x (D, h, w) box-averaged a maps
    mean_b: jax.Array,         # (D, h, w)
    out_hw: tuple[int, int],
    d_chunk: int = 16,
    upsample_impl: str = "lerp",
) -> jax.Array:
    """Fused upsample + WTA: evaluate q = up(mean_a)*I + up(mean_b) in
    d-chunks and fold a running (min, argmin) — the filtered full-res
    volume never materializes (at 2K/d=256 it would be 4x 2.8 GB).

    Same numerics as upsampling every slice then `wta_disparity`
    (first-minimum tie rule, disparity 0 excluded). Returns (H, W) uint8.
    """
    H, W = out_hw
    stack = jnp.stack([*mean_a, mean_b], axis=0)   # (4, D, h, w)
    D = stack.shape[1]
    if D % d_chunk:
        d_chunk = D
    n_chunks = D // d_chunk

    up_fn0 = resize_bilinear_mxu if upsample_impl == "mxu" else resize_bilinear
    if n_chunks == 1:
        # fully unrolled fast path (small sizes): per-map upsamples fuse
        # better than one stacked call, no scan machinery
        up = lambda t: up_fn0(t, (H, W))
        q = (
            up(mean_a[0]) * guide[..., 0][None]
            + up(mean_a[1]) * guide[..., 1][None]
            + up(mean_a[2]) * guide[..., 2][None]
            + up(mean_b)
        )
        return (jnp.argmin(q[1:], axis=0) + 1).astype(jnp.uint8)
    chunks = stack.reshape(4, n_chunks, d_chunk, *stack.shape[2:])
    chunks = jnp.moveaxis(chunks, 1, 0)            # (n_chunks, 4, dc, h, w)

    ch = tuple(guide[..., c] for c in range(3))
    up_fn = resize_bilinear_mxu if upsample_impl == "mxu" else resize_bilinear
    inf = jnp.float32(jnp.inf)

    def body(carry, blk):
        best, arg, d0 = carry
        up = up_fn(blk, (H, W))                    # (4, dc, H, W)
        q = (
            up[0] * ch[0][None]
            + up[1] * ch[1][None]
            + up[2] * ch[2][None]
            + up[3]
        )
        d_glob = d0 + jnp.arange(d_chunk, dtype=jnp.int32)
        q = jnp.where((d_glob == 0)[:, None, None], inf, q)  # d=0 never wins
        c_min = jnp.min(q, axis=0)
        c_arg = d0 + jnp.argmin(q, axis=0).astype(jnp.int32)
        take = c_min < best                        # strict: earlier d wins ties
        best = jnp.where(take, c_min, best)
        arg = jnp.where(take, c_arg, arg)
        return (best, arg, d0 + d_chunk), None

    init = (
        jnp.full((H, W), inf, jnp.float32),
        jnp.zeros((H, W), jnp.int32),
        jnp.int32(0),
    )
    (best, arg, _), _ = jax.lax.scan(body, init, chunks)
    return arg.astype(jnp.uint8)


def guided_filter_color(
    guide: jax.Array,          # (H, W, 3)
    p: jax.Array,              # (D, H, W)
    ksize: int = 8,
    eps: float = 1e-4,
) -> jax.Array:
    """Full-resolution color GIF (reference CVF semantics, src/CVF.cpp:72-165).

    The reference uses an 8x8 box (GIF_R_WIN used directly as the kernel
    size); even sizes follow OpenCV's anchor convention (window [i-4, i+3]).
    """
    ch = tuple(guide[..., c] for c in range(3))
    means, inv = _color_inverse_cov(ch, ksize, eps)
    (a_r, a_g, a_b), b = _solve_ab(p, ch, means, inv, ksize)
    q = (
        box_mean(a_r, ksize) * ch[0][None]
        + box_mean(a_g, ksize) * ch[1][None]
        + box_mean(a_b, ksize) * ch[2][None]
        + box_mean(b, ksize)
    )
    return q
