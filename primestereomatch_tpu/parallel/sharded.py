"""Explicitly sharded STEREO_GIF pipeline: shard_map over a (b, y, d) mesh.

This is the pod-scale execution path (SURVEY.md §5.7-5.8, §7 step 7). The
reference parallelizes disparity levels with OpenMP and rows with pthreads
inside ONE memory domain (src/DispEst.cpp:209-294, src/DispSel.cpp:51-88);
here the same two axes become mesh dimensions that span chips:

  b — frame batch, pure data parallelism (no communication)
  y — row tiles; windowed stages (guided filter, weighted median) get their
      support rows via a single neighbour halo exchange (`lax.ppermute`
      rides ICI), everything else is tile-local
  d — disparity blocks; CVC + CVF build/filter only the local block, WTA
      does a local argmin then a cross-shard (min, argmin) merge via
      `all_gather` over the d axis — an associative min-reduction, the
      same composition ring softmax-max uses

Design choices (TPU-first):
  * Halo rows of the COST volume are recomputed locally from exchanged
    image rows instead of exchanging D*halo*W cost values — compute is
    cheaper than ICI bytes for CVC's fused elementwise math.
  * Columns (W) stay unsharded: they are the vector-lane dimension and the
    cost at disparity d reads up to max_dis columns away, which would make
    an x-halo as wide as the whole disparity range (SURVEY.md §7).
  * Post-processing (JointWMF) runs replicated over the d axis — every
    d-shard computes the same answer rather than idling while one shard
    works (SPMD: same program, no divergence, zero extra wall-clock).

Exactness: with H % (s * y_shards) == 0 and W % s == 0, the sharded output
is identical to the single-device `stereo_gif_forward` (see
ops/guided_filter.py::fast_guided_filter_color_tile for the argument;
verified bitwise in tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from primestereomatch_tpu.config import GIFConfig
from primestereomatch_tpu.ops.color import bgr_to_gray_refquirk, sobel_x_k1
from primestereomatch_tpu.ops.cost_volume import build_cost_volume_block_sampled
from primestereomatch_tpu.ops.guided_filter import (
    fgf_tile_halo,
    fgf_wta_tile_low,
)
from primestereomatch_tpu.ops.jointwmf import joint_wmf
from primestereomatch_tpu.parallel.mesh import AXIS_BATCH, AXIS_DISP, AXIS_ROWS


def halo_exchange_rows(
    x: jax.Array,
    halo: int,
    n_shards: int,
    axis_name: str,
    row_axis: int = 0,
    edge: str = "reflect",
    block: int = 1,
) -> jax.Array:
    """Extend a row-sharded block with `halo` rows from each neighbour.

    Neighbour rows arrive via two `lax.ppermute`s (up + down shifts over
    the mesh ring). At the global top/bottom there is no neighbour; those
    rows are filled per `edge`:
      'reflect' — BORDER_REFLECT_101 of the local rows at `block`-row
                  granularity. block=1 is plain row reflect (what
                  cv::blur's default border sees, ops/boxfilter.py).
                  block=s makes the halo commute with a stride-s nearest
                  downsample: low-res pad row -k must sample full row k*s,
                  but a row-level reflection about row H-1 lands on
                  H-2-j — off the mod-s grid at the bottom. Reflecting
                  whole s-row blocks (pad block -k = block k) puts every
                  downsample-sampled row exactly where the global low-res
                  reflect-101 would read it (only block offset 0 is ever
                  sampled; the other rows of edge halo blocks are
                  placeholders never consumed by the low-res path).
      'zero'    — zeros (used to mark out-of-image rows invalid for the
                  clamped-window weighted median)
    Requires local rows >= halo + block (single-hop exchange + reflect
    support), and halo and rows divisible by block.
    """
    if halo == 0:
        return x
    nrows = x.shape[row_axis]
    if nrows < halo + block:
        raise ValueError(f"tile rows {nrows} must be >= halo {halo} + block {block}")
    if halo % block or nrows % block:
        raise ValueError(f"halo {halo} and rows {nrows} must be multiples of block {block}")

    def take(lo, hi):
        return lax.slice_in_dim(x, lo, hi, axis=row_axis)

    last = take(nrows - halo, nrows)     # my bottom rows -> neighbour below
    first = take(0, halo)                # my top rows -> neighbour above

    if n_shards > 1:
        down = [(i, i + 1) for i in range(n_shards - 1)]
        up = [(i + 1, i) for i in range(n_shards - 1)]
        from_above = lax.ppermute(last, axis_name, down)   # zeros on shard 0
        from_below = lax.ppermute(first, axis_name, up)    # zeros on last shard
    else:
        from_above = jnp.zeros_like(last)
        from_below = jnp.zeros_like(first)

    idx = lax.axis_index(axis_name)
    if edge == "reflect":
        import numpy as np

        b = block
        nb = nrows // b
        hb = halo // b
        # pad block -k mirrors block k; blocks kept in natural internal order
        top_idx = np.concatenate(
            [np.arange(k * b, k * b + b) for k in range(hb, 0, -1)]
        )
        # pad block nb+q mirrors block nb-2-q
        bot_idx = np.concatenate(
            [np.arange((nb - 2 - q) * b, (nb - 2 - q) * b + b) for q in range(hb)]
        )
        top_edge = jnp.take(x, jnp.asarray(top_idx), axis=row_axis)
        bot_edge = jnp.take(x, jnp.asarray(bot_idx), axis=row_axis)
    elif edge == "zero":
        top_edge = jnp.zeros_like(first)
        bot_edge = jnp.zeros_like(last)
    else:
        raise ValueError(f"unknown edge mode {edge!r}")

    shape_b = [1] * x.ndim
    is_top = (idx == 0).reshape(shape_b)
    is_bot = (idx == n_shards - 1).reshape(shape_b)
    top = jnp.where(is_top, top_edge, from_above)
    bot = jnp.where(is_bot, bot_edge, from_below)
    return jnp.concatenate([top, x, bot], axis=row_axis)


def _merge_wta(
    local_min: jax.Array,   # (..., H, W) min cost over the local d block
    local_arg: jax.Array,   # (..., H, W) GLOBAL disparity of that min
    n_shards: int,
    axis_name: str,
) -> jax.Array:
    """Cross-shard WTA merge: first-minimum tie rule == lowest disparity
    (reference strict-< ascending scan, src/DispSel.cpp:96-103), because
    all_gather orders shards by ascending d block."""
    if n_shards == 1:
        return local_arg
    g_min = lax.all_gather(local_min, axis_name)    # (dn, ..., H, W)
    g_arg = lax.all_gather(local_arg, axis_name)
    sel = jnp.argmin(g_min, axis=0)
    return jnp.take_along_axis(g_arg, sel[None], axis=0)[0]


def _to_u8(img01: jax.Array) -> jax.Array:
    return jnp.clip(jnp.rint(img01 * 255.0), 0, 255).astype(jnp.uint8)


def make_sharded_sgbm(mesh: Mesh, cfg=None):
    """Batch-data-parallel SGBM over the mesh's `b` axis.

    SGBM's directional scans are global recurrences over rows/columns —
    y-tiling them would serialize shards into a wavefront, so the
    throughput axis for SGBM is frames (the reference runs it single-image
    too, src/StereoMatch.cpp:169-187). Images shard over `b`; `y`/`d` axes
    are unused (the step still compiles on any mesh shape whose rows/disp
    axes divide nothing). Returns fn(l_u8, r_u8) -> (B, H, W) int16.
    """
    from primestereomatch_tpu.config import SGBMConfig
    from primestereomatch_tpu.models.sgbm_pipeline import stereo_sgbm_forward

    cfg = cfg or SGBMConfig()
    bn = mesh.shape[AXIS_BATCH]

    def shard_fn(l_blk, r_blk):
        if l_blk.shape[0] == 1:
            # single frame per shard: call the pipeline directly — vmap-of-1
            # routes the Pallas entries through their batched fold rules,
            # which measured ~2x slower at Teddy (BENCH_SUITE round 5:
            # 7.68 vs ~4 ms/frame); mirrors make_sharded_gif's fast path
            return stereo_sgbm_forward(l_blk[0], r_blk[0], cfg)[None]
        return jax.vmap(lambda a, b: stereo_sgbm_forward(a, b, cfg))(l_blk, r_blk)

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(AXIS_BATCH), P(AXIS_BATCH)),
        out_specs=P(AXIS_BATCH),
        check_vma=False,
    )

    @jax.jit
    def step(l_imgs, r_imgs):
        if l_imgs.shape[0] % bn:
            raise ValueError(
                f"batch {l_imgs.shape[0]} not divisible by b shards {bn}"
            )
        return mapped(l_imgs, r_imgs)

    return step


def make_sharded_gif(
    mesh: Mesh,
    cfg: GIFConfig = GIFConfig(),
    run_postprocess: bool = True,
):
    """Build the jitted, mesh-sharded STEREO_GIF step.

    Returns fn(l_imgs, r_imgs) -> (l_disp, r_disp) where the images are
    (B, H, W, 3) float32 in [0,1] (BGR) and outputs are (B, H, W) uint8.
    Constraints: B % b_shards == 0 and max_dis % d_shards == 0 always.
    When the mesh tiles rows or disparity (y_shards > 1 or d_shards > 1):
    H % (s * y_shards) == 0, W % s == 0, and H // y_shards >
    s*(2*(k//2)+2) with k = 2*(r//s)+1 (single-hop halo). A batch-only
    mesh runs the single-chip pipeline per shard and accepts any H/W it
    accepts.
    """
    bn = mesh.shape[AXIS_BATCH]
    yn = mesh.shape[AXIS_ROWS]
    dn = mesh.shape[AXIS_DISP]
    if cfg.max_dis % dn:
        raise ValueError(f"max_dis={cfg.max_dis} not divisible by d shards {dn}")
    # Guard documented sharded == single-device equivalence: the sharded
    # post-process implements exact-mode JointWMF only. pp_toolchain and
    # table-mode WMF need global state (k-means feature clustering spans the
    # whole image) — refuse rather than silently diverge (ADVICE r1).
    if cfg.pp_toolchain:
        raise ValueError(
            "make_sharded_gif does not implement cfg.pp_toolchain=True; "
            "use the single-device pipeline for the lrCheck/fillInv/wgtMedian "
            "toolchain"
        )
    if cfg.wmf_mode != "exact":
        raise ValueError(
            f"make_sharded_gif supports wmf_mode='exact' only (got "
            f"{cfg.wmf_mode!r}): table-mode feature clustering is global"
        )
    d_block = cfg.max_dis // dn
    halo = fgf_tile_halo(cfg.gif_radius, cfg.subsample)
    r_wmf = cfg.wmf_radius

    if yn == 1 and dn == 1:
        # batch-only mesh (pure data parallelism, the production serving
        # shape): no halos or merges are needed, so each shard runs the
        # single-chip fast path verbatim — including the Pallas lowmaps /
        # fused-WTA / WMF kernels on TPU — giving sharded == unsharded
        # per-chip throughput by construction. lax.map (not vmap) keeps
        # per-frame dispatch, the faster batch strategy for the match path
        # (see CLAUDE.md on vmap throughput).
        from primestereomatch_tpu.models.gif_pipeline import stereo_gif_forward

        def shard_fn(l_blk: jax.Array, r_blk: jax.Array):
            if l_blk.shape[0] == 1:
                # single frame per shard: call the fast path directly —
                # a length-1 lax.map still lowers to a scan whose
                # dynamic-update-slice carries block XLA fusion (measured
                # ~18% fps loss at Teddy mesh (1,1,1))
                ld, rd = stereo_gif_forward(
                    l_blk[0], r_blk[0], cfg, run_postprocess=run_postprocess
                )
                return ld[None], rd[None]
            return jax.lax.map(
                lambda lr: stereo_gif_forward(
                    lr[0], lr[1], cfg, run_postprocess=run_postprocess
                ),
                (l_blk, r_blk),
            )
    else:
        shard_fn = None  # defined below

    def _shard_fn_tiled(l_blk: jax.Array, r_blk: jax.Array):
        # l_blk, r_blk: (Bl, Ht, W, 3) local tiles, replicated over d
        Bl, Ht, W, _ = l_blk.shape
        H = Ht * yn
        y_idx = lax.axis_index(AXIS_ROWS)
        d_idx = lax.axis_index(AXIS_DISP)
        d0 = (d_idx * d_block).astype(jnp.int32)
        is_top = y_idx == 0
        is_bot = y_idx == yn - 1

        ex = functools.partial(
            halo_exchange_rows, halo=halo, n_shards=yn,
            axis_name=AXIS_ROWS, row_axis=1, edge="reflect",
            block=cfg.subsample,
        )
        l_ext = ex(l_blk)
        r_ext = ex(r_blk)

        import numpy as np

        He = Ht + 2 * halo
        s = cfg.subsample
        yi_t = np.arange(He // s) * s          # exact-scale tile sample grid
        xi_t = np.arange(W // s) * s

        def frame(l_e, r_e):
            # --- CVC at the FGF sample grid (halo rows recomputed locally;
            # the full-res cost tile never exists — same fast path as the
            # single-chip pipeline) ----------------------------------------
            l_grd = sobel_x_k1(bgr_to_gray_refquirk(l_e))
            r_grd = sobel_x_k1(bgr_to_gray_refquirk(r_e))
            if cfg.grad_offset:   # OpenCL-variant +0.5 (src/CVC_cl.cpp:108-111)
                l_grd = l_grd + cfg.grad_offset
                r_grd = r_grd + cfg.grad_offset
            lcv_low, rcv_low = build_cost_volume_block_sampled(
                l_e, r_e, l_grd, r_grd, d0, d_block, cfg.max_dis,
                yi_t, xi_t,
                alpha=cfg.alpha, border_cost=cfg.border_cost,
                tau1=cfg.tau1, tau2=cfg.tau2,
            )
            # --- fused CVF + upsample + local WTA over the d block: the
            # filtered (D_block, He, W) tile never materializes; d=0 never
            # selected globally (ops/guided_filter.py::fgf_wta_tile_low) --
            fused = functools.partial(
                fgf_wta_tile_low,
                radius=cfg.gif_radius, eps=cfg.gif_eps,
                subsample=cfg.subsample, halo=halo, global_h=H,
                is_top=is_top, is_bot=is_bot, d0=d0,
                interior=(halo, Ht),
            )
            l_min, l_arg = fused(l_e, lcv_low)
            r_min, r_arg = fused(r_e, rcv_low)
            return l_min, l_arg, r_min, r_arg

        l_min, l_arg, r_min, r_arg = jax.vmap(frame)(l_ext, r_ext)

        # --- cross-shard WTA merge over the d axis ------------------------
        l_disp = _merge_wta(l_min, l_arg, dn, AXIS_DISP).astype(jnp.uint8)
        r_disp = _merge_wta(r_min, r_arg, dn, AXIS_DISP).astype(jnp.uint8)

        if not run_postprocess:
            return l_disp, r_disp

        # --- JointWMF with disparity/guide halos (clamped global window) --
        exz = functools.partial(
            halo_exchange_rows, halo=r_wmf, n_shards=yn,
            axis_name=AXIS_ROWS, row_axis=1, edge="zero",
        )
        valid_ext = exz(jnp.ones((Bl, Ht, W), jnp.float32))
        l_d_ext = exz(l_disp)
        r_d_ext = exz(r_disp)
        # guide halo rows at global edges are never read (valid=0 there);
        # zero-fill is fine
        l_g_ext = _to_u8(exz(l_blk))
        r_g_ext = _to_u8(exz(r_blk))

        from primestereomatch_tpu.models.gif_pipeline import _use_pallas_wmf

        if _use_pallas_wmf(cfg):
            from primestereomatch_tpu.kernels import joint_wmf_pallas as _wmf_fn
        else:
            _wmf_fn = joint_wmf
        wmf = functools.partial(
            _wmf_fn, radius=r_wmf, n_bins=cfg.max_dis, sigma=cfg.wmf_sigma,
        )

        def pp(d_ext, g_ext, v_ext):
            return wmf(d_ext, g_ext, valid=v_ext)[r_wmf : r_wmf + Ht]

        l_out = jax.vmap(pp)(l_d_ext, l_g_ext, valid_ext)
        r_out = jax.vmap(pp)(r_d_ext, r_g_ext, valid_ext)
        return l_out, r_out

    if shard_fn is None:
        shard_fn = _shard_fn_tiled

    img_spec = P(AXIS_BATCH, AXIS_ROWS, None, None)
    out_spec = P(AXIS_BATCH, AXIS_ROWS, None)
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(img_spec, img_spec),
        out_specs=(out_spec, out_spec),
        check_vma=False,
    )

    batch_only = yn == 1 and dn == 1

    @jax.jit
    def step(l_imgs: jax.Array, r_imgs: jax.Array):
        B, Hh, Ww, _ = l_imgs.shape
        s = cfg.subsample
        if B % bn:
            raise ValueError(f"batch {B} not divisible by b shards {bn}")
        if batch_only:
            # single-chip fast path per shard: arbitrary H/W, same as
            # stereo_gif_forward (nearest_indices handles H % s != 0)
            return mapped(l_imgs, r_imgs)
        if Hh % (yn * s) or Ww % s:
            raise ValueError(
                f"shape ({B},{Hh},{Ww}) incompatible with mesh "
                f"(b={bn}, y={yn}) and subsample {s}; pad rows to a "
                f"multiple of {yn * s} (and W to a multiple of {s}) or "
                f"use a batch-only mesh"
            )
        if Hh // yn < max(halo + s, r_wmf + 1):
            raise ValueError(
                f"row tile {Hh // yn} too small for halo {max(halo, r_wmf)}"
            )
        return mapped(l_imgs, r_imgs)

    return step
