"""STEREO_GIF end-to-end pipeline (the reference golden path, TPU-native).

Stage map (reference call stack, src/StereoMatch.cpp:207-242 ->
src/DispEst.cpp):

  CVC  cost volume construction   src/CVC.cpp:122,151      -> ops/cost_volume
  CVF  fast guided filtering      src/fastguidedfilter.cpp -> ops/guided_filter
  WTA  disparity selection        src/DispSel.cpp:83       -> ops/wta
  PP   joint weighted median      src/PP.cpp:402, JointWMF.h -> ops/jointwmf

The whole forward is one jit-compiled function over static-shape f32 inputs
(images in [0,1], BGR channel order as loaded by the reference's imread).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from primestereomatch_tpu.config import GIFConfig
from primestereomatch_tpu.ops.color import bgr_to_gray_refquirk, sobel_x_k1
from primestereomatch_tpu.ops.cost_volume import (
    build_cost_volumes,
    build_cost_volumes_sampled,
)
from primestereomatch_tpu.ops.guided_filter import (
    fast_guided_filter_color,
    fast_guided_filter_color_low,
    fgf_low_maps,
    fgf_wta_low_maps,
)
from primestereomatch_tpu.ops.resize import nearest_indices
from primestereomatch_tpu.ops.wta import wta_disparity
from primestereomatch_tpu.ops.jointwmf import joint_wmf
from primestereomatch_tpu.ops.postproc import fill_invalid, lr_check, weighted_median


def _to_u8(img01: jax.Array) -> jax.Array:
    """cv::Mat::convertTo(CV_8UC3, 255): saturate_cast(cvRound(v*255)),
    round-half-to-even (src/PP.cpp:418-419)."""
    return jnp.clip(jnp.rint(img01 * 255.0), 0, 255).astype(jnp.uint8)


def _wta_dc(cfg: GIFConfig) -> int:
    """Requested disparity-chunk depth, clamped to a divisor of max_dis
    (the '1'-'8' runtime parallelism knob; kernels require D % dc == 0)."""
    dc = max(1, min(cfg.wta_d_chunk, cfg.max_dis))
    while cfg.max_dis % dc:
        dc -= 1
    return dc


def _use_pallas_wmf(cfg: GIFConfig) -> bool:
    if cfg.wmf_mode != "exact":
        return False
    if cfg.wmf_impl == "pallas":
        return True
    return cfg.wmf_impl == "auto" and jax.default_backend() == "tpu"


def _wmf_exact(disp: jax.Array, img01: jax.Array, cfg: GIFConfig) -> jax.Array:
    """JointWMF dispatch: fused Pallas kernel on TPU, jnp elsewhere."""
    if _use_pallas_wmf(cfg):
        from primestereomatch_tpu.kernels import joint_wmf_pallas

        return joint_wmf_pallas(
            disp, _to_u8(img01), radius=cfg.wmf_radius,
            n_bins=cfg.max_dis, sigma=cfg.wmf_sigma,
        )
    return joint_wmf(
        disp, _to_u8(img01), radius=cfg.wmf_radius,
        n_bins=cfg.max_dis, sigma=cfg.wmf_sigma,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "run_postprocess"))
def stereo_gif_forward(
    l_img: jax.Array,              # (H, W, 3) float32 in [0,1], BGR order
    r_img: jax.Array,
    cfg: GIFConfig = GIFConfig(),
    run_postprocess: bool = True,
    l_findex: jax.Array | None = None,   # optional 'table'-mode WMF features
    r_findex: jax.Array | None = None,
    wmap: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Full STEREO_GIF forward: returns (l_disp, r_disp) uint8 (H, W)."""
    if l_img.shape != r_img.shape or l_img.ndim != 3 or l_img.shape[-1] != 3:
        raise ValueError(
            f"expected matching (H, W, 3) images, got {l_img.shape} vs {r_img.shape}"
        )
    if not jnp.issubdtype(l_img.dtype, jnp.floating):
        raise TypeError(
            f"images must be floating point in [0,1] (got {l_img.dtype}); "
            "scale uint8 inputs by 1/255 first"
        )
    # --- CVC + CVF (FGF), fused at the subsample grid ----------------------
    # The FGF consumes the cost volume only at its nearest-downsample grid
    # (src/fastguidedfilter.cpp:96,132), so the cost is built directly at
    # the sampled pixels — bitwise-identical to building the full D,H,W
    # volume and downsampling, at 1/s^2 of the work.
    l_grd = sobel_x_k1(bgr_to_gray_refquirk(l_img))
    r_grd = sobel_x_k1(bgr_to_gray_refquirk(r_img))
    if cfg.grad_offset:   # OpenCL-variant +0.5 (src/CVC_cl.cpp:108-111)
        l_grd = l_grd + cfg.grad_offset
        r_grd = r_grd + cfg.grad_offset
    H, W, _ = l_img.shape
    s = cfg.subsample
    yi = nearest_indices(H, H // s)
    xi = nearest_indices(W, W // s)
    up_impl = cfg.upsample_impl
    if up_impl == "auto":
        up_impl = "mxu" if jax.default_backend() == "tpu" else "lerp"

    # --- CVF + WTA, fused over disparity chunks ----------------------------
    # the filtered full-res volume is reduced to its argmin on the fly
    # (ops/guided_filter.py::fgf_wta_low_maps) — at 2K/d=256 it would
    # otherwise cost 4 x 2.8 GB of HBM per view
    wta_impl = cfg.wta_impl
    if wta_impl == "auto":
        wta_impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    # CVC: on the fused-tail exact-stride path the cost volume is built
    # INSIDE the low-maps kernel (kernels/cvc_lowmaps_pallas.py) — decide
    # first so the (D, h, w) volume is only materialized when consumed.
    from primestereomatch_tpu.kernels.cvc_lowmaps_pallas import (
        cvc_lowmaps_applicable,
    )
    from primestereomatch_tpu.kernels.wta_pallas import poly_col_params as _pcp

    pp_probe = _pcp(len(xi), W)
    fuse_cvc = (
        cfg.cvc_impl in ("auto", "fused")
        and cfg.cvc_dtype == "f32"
        and wta_impl == "pallas"
        and cfg.max_dis % _wta_dc(cfg) == 0
        and pp_probe is not None and pp_probe["exact"]
        and cvc_lowmaps_applicable(
            W, len(xi), xi, cfg.max_dis, s, radius=cfg.gif_radius,
            out_wp=pp_probe["out_wp"], out_margin=pp_probe["margin"],
        )
    )
    if cfg.cvc_impl == "xla":
        fuse_cvc = False
    if cfg.cvc_dtype == "u8":
        # quantized uchar-kernel variant (see GIFConfig.cvc_dtype): build
        # the full-res u8 volumes with the .cl semantics, sample to the
        # FGF grid, feed the float chain at /255 scale
        from primestereomatch_tpu.ops.color import (
            bgr_to_gray_refquirk_u8,
            sobel_x_k1_u8,
        )
        from primestereomatch_tpu.ops.cost_volume import build_cost_volumes_u8
        from primestereomatch_tpu.ops.resize import resize_nearest

        l_u8 = _to_u8(l_img)
        r_u8 = _to_u8(r_img)
        lcv8, rcv8 = build_cost_volumes_u8(
            l_u8, r_u8,
            sobel_x_k1_u8(bgr_to_gray_refquirk_u8(l_u8)),
            sobel_x_k1_u8(bgr_to_gray_refquirk_u8(r_u8)),
            cfg.max_dis, alpha=cfg.alpha,
        )
        low_hw = (len(yi), len(xi))
        lcv_low = resize_nearest(lcv8, low_hw).astype(jnp.float32) / 255.0
        rcv_low = resize_nearest(rcv8, low_hw).astype(jnp.float32) / 255.0
    elif not fuse_cvc:
        lcv_low, rcv_low = build_cost_volumes_sampled(
            l_img, r_img, l_grd, r_grd, cfg.max_dis, yi, xi,
            alpha=cfg.alpha, border_cost=cfg.border_cost,
            tau1=cfg.tau1, tau2=cfg.tau2,
        )
    if wta_impl == "pallas" and cfg.max_dis % _wta_dc(cfg) == 0:
        # fully fused TPU path: the low-res (a, b) chain runs in one Pallas
        # kernel emitting the maps in the WTA kernel's padded layout — the
        # maps are written once and DMA'd once (kernels/lowmaps_pallas.py).
        # The two VIEWS fold into one launch per stage (batch-of-2 on the
        # row-tile grid axis) — halves the kernel dispatch count, bitwise-
        # equal to per-view. Polyphase-eligible column ratios (exact AND
        # the quasi Middlebury widths) take the matmul-free poly variant.
        from primestereomatch_tpu.kernels.lowmaps_pallas import (
            fgf_low_maps_pallas_batched,
        )
        from primestereomatch_tpu.kernels.wta_pallas import (
            fgf_wta_pallas_maps_batched,
            poly_col_params,
        )

        h, w = len(yi), len(xi)
        pp = poly_col_params(w, W)
        dc = _wta_dc(cfg)
        if pp is not None and pp["exact"]:
            # exact integer ratios (2K/HD720/ZED): per-view static poly
            # dispatch — the view fold's jnp.stack copies cost more than
            # the saved launch at these sizes (measured +2 ms at 2K)
            from primestereomatch_tpu.kernels.wta_pallas import (
                fgf_wta_pallas_maps,
            )

            # FULL tail fusion: cost + maps chain + WTA in ONE kernel
            # (kernels/cvc_wta_pallas.py) — the maps tensor never hits
            # HBM. Requires the same geometry the fused CVC does, plus
            # phase periodicity (cvc_wta_applicable).
            if fuse_cvc and cfg.tail_fusion == "full":
                from primestereomatch_tpu.kernels.cvc_wta_pallas import (
                    cvc_fgf_wta_pallas,
                    cvc_wta_applicable,
                )

                if cvc_wta_applicable(
                    W, len(xi), xi, cfg.max_dis, s, H, len(yi),
                    radius=cfg.gif_radius,
                ):
                    fwta = functools.partial(
                        cvc_fgf_wta_pallas, max_dis=cfg.max_dis,
                        yi=yi, xi=xi, radius=cfg.gif_radius,
                        eps=cfg.gif_eps, subsample=s, alpha=cfg.alpha,
                        border_cost=cfg.border_cost,
                        tau1=cfg.tau1, tau2=cfg.tau2,
                    )
                    l_disp = fwta(l_img, l_grd, r_img, r_grd, is_left=True)
                    r_disp = fwta(r_img, r_grd, l_img, l_grd, is_left=False)
                    return _gif_postprocess(
                        l_disp, r_disp, l_img, r_img, cfg, run_postprocess,
                        l_findex, r_findex, wmap,
                    )
            if fuse_cvc:
                # cost volume built inside the low-maps kernel from the
                # polyphase planes — never materialized in HBM
                from primestereomatch_tpu.kernels.cvc_lowmaps_pallas import (
                    cvc_fgf_low_maps_pallas,
                )

                lowm_f = functools.partial(
                    cvc_fgf_low_maps_pallas, max_dis=cfg.max_dis,
                    yi=yi, xi=xi, radius=cfg.gif_radius, eps=cfg.gif_eps,
                    subsample=s, out_wp=pp["out_wp"], out_margin=pp["margin"],
                    alpha=cfg.alpha, border_cost=cfg.border_cost,
                    tau1=cfg.tau1, tau2=cfg.tau2, poison_d0=True,
                )
                maps_l = lowm_f(l_img, l_grd, r_img, r_grd, True)
                maps_r = lowm_f(r_img, r_grd, l_img, l_grd, False)
            else:
                from primestereomatch_tpu.kernels.lowmaps_pallas import (
                    fgf_low_maps_pallas,
                )

                lowm = functools.partial(
                    fgf_low_maps_pallas, radius=cfg.gif_radius,
                    eps=cfg.gif_eps, subsample=s,
                    out_wp=pp["out_wp"], out_margin=pp["margin"],
                    poison_d0=True,
                )
                maps_l = lowm(l_img, lcv_low)
                maps_r = lowm(r_img, rcv_low)
            # the producers poisoned maps[:, 0] (a_*=0, b=D0_POISON), so
            # the WTA kernel skips its per-chunk d==0 inf mask entirely
            wta = functools.partial(
                fgf_wta_pallas_maps, d_chunk=dc, poly=True, mask_d0=False,
                maps_layout="poly",
            )
            l_disp = wta(l_img, maps_l, (h, w), (H, W))
            r_disp = wta(r_img, maps_r, (h, w), (H, W))
        else:
            # small/odd shapes: fold the two VIEWS into one launch per
            # stage; quasi ratios take the masked poly variant, the rest
            # the generic banded-matmul kernel
            g2 = jnp.stack([l_img, r_img])
            p2 = jnp.stack([lcv_low, rcv_low])
            lw_kw = (
                {} if pp is None
                else {"out_wp": pp["out_wp"], "out_margin": pp["margin"]}
            )
            maps2 = fgf_low_maps_pallas_batched(
                g2, p2, radius=cfg.gif_radius, eps=cfg.gif_eps, subsample=s,
                poison_d0=True, **lw_kw,
            )
            d2 = fgf_wta_pallas_maps_batched(
                g2, maps2, (h, w), (H, W), d_chunk=dc, poly=pp is not None,
                mask_d0=False,
                maps_layout="poly" if pp is not None else "auto",
            )
            l_disp, r_disp = d2[0], d2[1]
    else:
        low = functools.partial(
            fgf_low_maps, radius=cfg.gif_radius, eps=cfg.gif_eps, subsample=s
        )
        ma_l, mb_l = low(l_img, lcv_low)
        ma_r, mb_r = low(r_img, rcv_low)
        # single chunk (the fully-unrolled fast path) while the upsampled
        # tensors stay small; chunk to bound memory at big sizes (2K/d=256
        # would need 4 x 2.8 GB per view otherwise)
        full_bytes = 4 * cfg.max_dis * H * W * 4
        d_chunk = cfg.max_dis if full_bytes <= (1 << 30) else min(16, cfg.max_dis)
        wta = functools.partial(
            fgf_wta_low_maps, out_hw=(H, W),
            d_chunk=d_chunk, upsample_impl=up_impl,
        )
        l_disp = wta(l_img, ma_l, mb_l)
        r_disp = wta(r_img, ma_r, mb_r)

    return _gif_postprocess(
        l_disp, r_disp, l_img, r_img, cfg, run_postprocess,
        l_findex, r_findex, wmap,
    )


def _gif_postprocess(
    l_disp, r_disp, l_img, r_img, cfg: GIFConfig, run_postprocess,
    l_findex=None, r_findex=None, wmap=None,
):
    """Shared PP tail of stereo_gif_forward (src/PP.cpp:402-425)."""
    if run_postprocess and cfg.pp_toolchain:
        # the reference's full (shipped-disabled) toolchain, src/PP.cpp:405-413
        l_valid, r_valid = lr_check(l_disp, r_disp)
        l_disp = fill_invalid(l_disp, l_valid)
        r_disp = fill_invalid(r_disp, r_valid)
        l_disp = weighted_median(
            l_img, l_disp, l_valid, cfg.max_dis, cfg.med_sz,
            cfg.sig_clr, cfg.sig_dis, use_sqrt=False,
        )
        r_disp = weighted_median(
            r_img, r_disp, r_valid, cfg.max_dis, cfg.med_sz,
            cfg.sig_clr, cfg.sig_dis, use_sqrt=True,
        )
    # --- PP (JointWMF) -------------------------------------------------------
    if run_postprocess:
        if cfg.wmf_mode == "table" and l_findex is not None:
            l_disp = joint_wmf(
                l_disp, radius=cfg.wmf_radius, n_bins=cfg.max_dis,
                sigma=cfg.wmf_sigma, findex=l_findex, wmap=wmap,
            )
            r_disp = joint_wmf(
                r_disp, radius=cfg.wmf_radius, n_bins=cfg.max_dis,
                sigma=cfg.wmf_sigma, findex=r_findex, wmap=wmap,
            )
        else:
            l_disp = _wmf_exact(l_disp, l_img, cfg)
            r_disp = _wmf_exact(r_disp, r_img, cfg)
    return l_disp, r_disp


@functools.partial(jax.jit, static_argnames=("cfg", "run_postprocess", "tail_impl"))
def stereo_gif_forward_batch(
    l_imgs: jax.Array,             # (B, H, W, 3) float32 in [0,1], BGR
    r_imgs: jax.Array,
    cfg: GIFConfig = GIFConfig(),
    run_postprocess: bool = True,
    tail_impl: str = "auto",       # auto | xla | pallas
) -> tuple[jax.Array, jax.Array]:
    """Batch-aware STEREO_GIF forward: returns (B, H, W) uint8 pairs.

    `jax.vmap(stereo_gif_forward)` regresses ~1.7x on TPU because the
    match path's static sample gathers acquire vmap batch dims. Here the
    batch FOLDS INTO THE ROW AXIS for CVC — every CVC op (grayscale,
    Sobel-x, per-d column shifts, border masks, sample gathers) is
    row-local, so B stacked images behave exactly like one B*H-row image
    and the gathers keep static batch-free indices. The 2D stages then
    run per frame: tail_impl='xla' vmaps the chunked-matmul upsample+WTA
    (batched MXU work amortizes small-image dispatch), 'pallas' lax.maps
    the single-frame fused-kernel fast path ('auto' = pallas on TPU).
    Per-frame results are bitwise-equal to `stereo_gif_forward`
    (tests/test_app.py::test_forward_batch_matches_per_frame).
    """
    B, H, W, _ = l_imgs.shape
    if cfg.pp_toolchain or cfg.wmf_mode != "exact":
        raise ValueError(
            "stereo_gif_forward_batch supports the default exact-WMF path "
            "only; run pp_toolchain/table-mode frames through "
            "stereo_gif_forward"
        )
    import numpy as np

    # --- CVC with the batch folded into rows -------------------------------
    l_flat = l_imgs.reshape(B * H, W, 3)
    r_flat = r_imgs.reshape(B * H, W, 3)
    l_grd = sobel_x_k1(bgr_to_gray_refquirk(l_flat))
    r_grd = sobel_x_k1(bgr_to_gray_refquirk(r_flat))
    if cfg.grad_offset:   # OpenCL-variant +0.5 (src/CVC_cl.cpp:108-111)
        l_grd = l_grd + cfg.grad_offset
        r_grd = r_grd + cfg.grad_offset
    s = cfg.subsample
    yi = nearest_indices(H, H // s)
    xi = nearest_indices(W, W // s)
    yi_b = np.concatenate([yi + b * H for b in range(B)])
    lcv, rcv = build_cost_volumes_sampled(
        l_flat, r_flat, l_grd, r_grd, cfg.max_dis, yi_b, xi,
        alpha=cfg.alpha, border_cost=cfg.border_cost,
        tau1=cfg.tau1, tau2=cfg.tau2,
    )
    h, w = len(yi), len(xi)
    lcv = jnp.moveaxis(lcv.reshape(cfg.max_dis, B, h, w), 1, 0)  # (B, D, h, w)
    rcv = jnp.moveaxis(rcv.reshape(cfg.max_dis, B, h, w), 1, 0)

    impl = tail_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    if impl == "pallas":
        from primestereomatch_tpu.kernels.lowmaps_pallas import (
            fgf_low_maps_pallas_batched,
        )
        from primestereomatch_tpu.kernels.wta_pallas import (
            fgf_wta_pallas_maps_batched,
            poly_col_params,
        )

        dc = _wta_dc(cfg)
        pp = poly_col_params(w, W)
        # ONE folded pallas_call per stage for all 2B views (frames on the
        # row-tile grid axis) — per-frame kernel dispatch is what caps
        # small-image batch fps. Polyphase-eligible column ratios (incl.
        # the quasi Middlebury widths) take the matmul-free poly variant.
        g_all = jnp.concatenate([l_imgs, r_imgs])
        p_all = jnp.concatenate([lcv, rcv])
        lw_kw = (
            {} if pp is None
            else {"out_wp": pp["out_wp"], "out_margin": pp["margin"]}
        )
        maps = fgf_low_maps_pallas_batched(
            g_all, p_all, radius=cfg.gif_radius, eps=cfg.gif_eps,
            subsample=s, poison_d0=True, **lw_kw,
        )
        d_all = fgf_wta_pallas_maps_batched(
            g_all, maps, (h, w), (H, W), d_chunk=dc, poly=pp is not None,
            mask_d0=False,
            maps_layout="poly" if pp is not None else "auto",
        )
        if run_postprocess:
            # joint_wmf_pallas's custom_vmap lowers to one batched call
            d_all = jax.vmap(lambda d, i: _wmf_exact(d, i, cfg))(
                d_all, g_all
            )
        return d_all[:B], d_all[B:]

    up_impl = cfg.upsample_impl
    if up_impl == "auto":
        up_impl = "mxu" if jax.default_backend() == "tpu" else "lerp"
    full_bytes = 4 * cfg.max_dis * H * W * 4
    d_chunk = cfg.max_dis if full_bytes <= (1 << 30) else min(16, cfg.max_dis)

    def frame_xla(li, ri, lc, rc):
        low = functools.partial(
            fgf_low_maps, radius=cfg.gif_radius, eps=cfg.gif_eps, subsample=s
        )
        ma_l, mb_l = low(li, lc)
        ma_r, mb_r = low(ri, rc)
        wta = functools.partial(
            fgf_wta_low_maps, out_hw=(H, W),
            d_chunk=d_chunk, upsample_impl=up_impl,
        )
        ld, rd = wta(li, ma_l, mb_l), wta(ri, ma_r, mb_r)
        if run_postprocess:
            ld = _wmf_exact(ld, li, cfg)
            rd = _wmf_exact(rd, ri, cfg)
        return ld, rd

    return jax.vmap(frame_xla)(l_imgs, r_imgs, lcv, rcv)


class StereoGIF:
    """Object-style wrapper mirroring the reference DispEst engine lifecycle
    (src/DispEst.cpp:10-50): construct once per image geometry, then call
    per frame. Owns nothing mutable — it simply binds a config."""

    def __init__(self, cfg: GIFConfig = GIFConfig()):
        self.cfg = cfg

    def __call__(self, l_img, r_img, **kw):
        return stereo_gif_forward(l_img, r_img, self.cfg, **kw)


# ---------------------------------------------------------------------------
# Staged engine: the reference DispEst four-stage API (CostConst /
# CostFilter / DispSelect / PostProcess, src/DispEst.cpp:199-344) as four
# independently jitted functions. The fused `stereo_gif_forward` is the
# fast path; this staged form exists for per-stage timing (the reference's
# per-frame stage monitors, src/StereoMatch.cpp:209-242) and debugging.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _stage_cvc(l_img, r_img, cfg: GIFConfig):
    l_grd = sobel_x_k1(bgr_to_gray_refquirk(l_img))
    r_grd = sobel_x_k1(bgr_to_gray_refquirk(r_img))
    if cfg.grad_offset:   # OpenCL-variant +0.5 (src/CVC_cl.cpp:108-111)
        l_grd = l_grd + cfg.grad_offset
        r_grd = r_grd + cfg.grad_offset
    return build_cost_volumes(
        l_img, r_img, l_grd, r_grd,
        max_dis=cfg.max_dis, alpha=cfg.alpha, border_cost=cfg.border_cost,
        tau1=cfg.tau1, tau2=cfg.tau2,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _stage_cvf(img, cv, cfg: GIFConfig):
    return fast_guided_filter_color(img, cv, cfg.gif_radius, cfg.gif_eps, cfg.subsample)


_stage_wta = jax.jit(wta_disparity)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _stage_pp(disp, img, cfg: GIFConfig):
    return _wmf_exact(disp, img, cfg)


class DispEst:
    """Four-stage disparity estimation engine (reference: src/DispEst.cpp).

    cost_const  -> CostConst   (CVC,  src/DispEst.cpp:199)
    cost_filter -> CostFilter  (CVF/FGF, src/DispEst.cpp:281)
    disp_select -> DispSelect  (WTA,  src/DispEst.cpp:311)
    post_process-> PostProcess (JointWMF, src/DispEst.cpp:330)
    """

    def __init__(self, cfg: GIFConfig = GIFConfig()):
        self.cfg = cfg

    def cost_const(self, l_img, r_img):
        return _stage_cvc(l_img, r_img, self.cfg)

    def cost_filter(self, img, cv):
        return _stage_cvf(img, cv, self.cfg)

    def disp_select(self, cv):
        return _stage_wta(cv)

    def post_process(self, disp, img):
        return _stage_pp(disp, img, self.cfg)

    def dump_cost_volume(self, cv, prefix: str) -> list[str]:
        """Write every cost slice as a PNG — printCV parity
        (src/DispEst.cpp:181-194; the reference scales slice values by 255
        into 8-bit images). Returns the written paths. The reference's
        sprintf early-return bug is not replicated."""
        import numpy as np

        paths = []
        cv_np = np.asarray(cv)
        for d in range(cv_np.shape[0]):
            img = np.clip(np.rint(cv_np[d] * 255.0), 0, 255).astype(np.uint8)
            path = f"{prefix}{d:03d}.png"
            try:
                from primestereomatch_tpu import native

                native.imwrite_png(path, img)
            except Exception:
                from PIL import Image

                Image.fromarray(img).save(path)
            paths.append(path)
        return paths

    def compute(self, l_img, r_img):
        """Stage-by-stage forward (same result as stereo_gif_forward)."""
        lcv, rcv = self.cost_const(l_img, r_img)
        lcv = self.cost_filter(l_img, lcv)
        rcv = self.cost_filter(r_img, rcv)
        l_disp = self.disp_select(lcv)
        r_disp = self.disp_select(rcv)
        l_disp = self.post_process(l_disp, l_img)
        r_disp = self.post_process(r_disp, r_img)
        return l_disp, r_disp
