"""STEREO_SGBM end-to-end pipeline (second matching algorithm).

Reference integration points: algorithm construction with the fixed
parameter set (src/StereoMatch.cpp:639-660), per-frame compute + 16x
fixed-point rescale for display (src/StereoMatch.cpp:169-187), runtime
toggle from the GIF path (src/main.cpp:160-169).

The whole forward is one jit-compiled integer pipeline:
prefilter (clipped [1,2,1]-smoothed Sobel-x) -> BT pixel cost -> 5x5
block sum -> 8-direction scan aggregation -> WTA/uniqueness/sub-pixel/
scatter-LR-check (cv::StereoSGBM selection semantics) -> speckle filter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from primestereomatch_tpu.config import SGBMConfig
from primestereomatch_tpu.ops.sgbm import (
    DISP_SCALE,
    aggregate,
    bt_block_cost,
    filter_speckles,
    select_disparity_hdw,
    sobel_xclip,
)


@functools.partial(jax.jit, static_argnames=("cfg",))
def stereo_sgbm_forward(
    l_img_u8: jax.Array,       # (H, W, C) uint8 (BGR, as the reference loads)
    r_img_u8: jax.Array,
    cfg: SGBMConfig = SGBMConfig(),
) -> jax.Array:
    """Returns (H, W) int16 disparity scaled by 16; invalid pixels are
    (min_disparity - 1) * 16 (the convention src/StereoMatch.cpp:181-186
    rescales for display)."""
    if l_img_u8.shape != r_img_u8.shape or l_img_u8.ndim != 3:
        raise ValueError(
            f"expected matching (H, W, C) images, got {l_img_u8.shape} vs {r_img_u8.shape}"
        )
    # cv::StereoSGBM's prefilter: [1,2,1]-smoothed clipped Sobel-x
    # (ops/sgbm.py::sobel_xclip — raises cv2 argmin agreement 86% -> 95%)
    l_ftr = sobel_xclip(l_img_u8, cfg.pre_filter_cap)
    r_ftr = sobel_xclip(r_img_u8, cfg.pre_filter_cap)

    # static value bound on the window cost (BT cost per channel is at most
    # 2*cap since features live in [0, 2*cap]) — lets the aggregation scans
    # write narrow dtypes without any value change
    H, W, ch = l_img_u8.shape
    cost_bound = cfg.block_size**2 * ch * 2 * cfg.pre_filter_cap
    agg_impl = cfg.agg_impl
    if agg_impl == "auto":
        # the Pallas scan kernel needs sublane-aligned D (int16 tiling)
        agg_impl = (
            "pallas"
            if jax.default_backend() == "tpu" and cfg.num_disparities % 8 == 0
            else "xla"
        )
    # fused BT + window sum in (D, H, W): the pixel-cost volume never hits
    # HBM and W stays on lanes end-to-end (cost -> scans -> select). On the
    # Pallas path the cost kernel keeps feature tiles VMEM-resident across
    # the d loop and hands a zero-padded volume straight to the scans.
    use_cost_kernel = (
        agg_impl == "pallas"
        and ch == 3
        and 2 * cfg.pre_filter_cap <= 127
        and cost_bound < 2**15
    )
    S = None
    if use_cost_kernel:
        from primestereomatch_tpu.kernels.select_pallas import (
            select_disparity_partials_pallas,
        )
        from primestereomatch_tpu.kernels.sgbm_pallas import (
            bt_block_cost_pallas,
            sgbm_aggregate_partials_pallas,
        )

        C = bt_block_cost_pallas(
            l_ftr, r_ftr, cfg.num_disparities, cfg.block_size,
            cost_bound=cost_bound,
            # extra zero rows are scan-neutral and make the x-scan's lane
            # pad a no-op (saves a 1.4 GB copy at 2K). NOTE out_layout
            # stays 'dhw': emitting the y-scan-ready 'hdw' layout from the
            # cost kernel costs ~6 ms of strided stores at 2K vs the
            # ~4.8 ms transpose it saves (measured) — net loss.
            rows_to=-(-H // 128) * 128,
        )
        # the aggregated volume S never exists in HBM: the selection
        # kernel reads the scan groups' uint16 partial sums directly
        # (bit-identical to select_disparity_hdw(sum(parts)))
        parts = sgbm_aggregate_partials_pallas(
            C, cfg.p1, cfg.p2, cfg.num_directions, cost_bound=cost_bound,
            in_layout="dhw", logical_hw=(H, W),
        )
        disp16 = select_disparity_partials_pallas(
            parts, (H, W), cfg.uniqueness_ratio, cfg.disp12_max_diff,
            cfg.min_disparity,
            # static S bound enables the single-pass packed-key kernel
            value_bound=cfg.num_directions * (cost_bound + cfg.p2),
        )
    else:
        C = bt_block_cost(
            l_ftr, r_ftr, cfg.num_disparities, cfg.block_size,
            cost_bound=cost_bound, feat_bound=2 * cfg.pre_filter_cap,
            out_layout="dhw",
        )
        if agg_impl == "pallas":
            from primestereomatch_tpu.kernels.sgbm_pallas import (
                sgbm_aggregate_pallas,
            )

            S = sgbm_aggregate_pallas(
                C, cfg.p1, cfg.p2, cfg.num_directions, cost_bound=cost_bound,
                in_layout="dhw", out_layout="hdw",
            )
        else:
            S = aggregate(
                jnp.transpose(C, (1, 2, 0)), cfg.p1, cfg.p2,
                cfg.num_directions, cost_bound=cost_bound,
            )
            S = jnp.transpose(S, (0, 2, 1))
    if S is not None:
        disp16 = select_disparity_hdw(
            S, cfg.uniqueness_ratio, cfg.disp12_max_diff, cfg.min_disparity
        )
    if cfg.speckle_window_size > 0:
        disp16 = filter_speckles(
            disp16,
            cfg.speckle_window_size,
            DISP_SCALE * cfg.speckle_range,
            (cfg.min_disparity - 1) * DISP_SCALE,
        )
    return disp16


def sgbm_display_u8(
    disp16: jax.Array, scale_factor: int, max_dis: int, mode: str = "canonical"
) -> jax.Array:
    """Display/eval conversion of the 16x fixed-point disparity map.

    mode='canonical' (the library default used for %BP eval): integer
    disparity = disp16 / 16 (invalid -> 0), scaled like the GIF maps.

    mode='reference' reproduces the reference display path EXACTLY
    (src/StereoMatch.cpp:181-186): minMaxLoc over the raw int16 map
    (including the -16 invalid sentinel), convertTo(CV_8U, 255/(max-min))
    (round-half-to-even, saturate, NO -min shift), then the rounded
    /4 division and *scale_factor saturation of the u8 Mat ops. Note the
    result is data-dependent (per-frame normalization) — good for viewing,
    unusable as a metric input; that is the reference's behavior.
    """
    if mode == "reference":
        minv = jnp.min(disp16).astype(jnp.float32)
        maxv = jnp.max(disp16).astype(jnp.float32)
        denom = maxv - minv
        alpha = jnp.where(denom > 0, 255.0 / jnp.maximum(denom, 1e-30), 0.0)
        # convertTo: saturate_cast<uchar>(cvRound(v * alpha))
        u8 = jnp.clip(jnp.rint(disp16.astype(jnp.float32) * alpha), 0, 255)
        # (lDispMap / 4) * scale_factor: cv u8 Mat ops round the division
        # (saturate_cast(cvRound(x / 4.0))) and saturate the product
        u8 = jnp.rint(u8 / 4.0)
        return jnp.clip(u8 * scale_factor, 0, 255).astype(jnp.uint8)
    d = jnp.maximum(disp16.astype(jnp.int32), 0) // DISP_SCALE
    return jnp.clip(d, 0, max_dis - 1).astype(jnp.uint8)


class StereoSGBM:
    """Object wrapper mirroring the reference's persistent cv::StereoSGBM
    instance (setupOpenCVSGBM, src/StereoMatch.cpp:639-660)."""

    def __init__(self, cfg: SGBMConfig = SGBMConfig()):
        self.cfg = cfg

    def __call__(self, l_img_u8, r_img_u8):
        return stereo_sgbm_forward(l_img_u8, r_img_u8, self.cfg)
