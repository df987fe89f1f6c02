"""Static pipeline configuration.

All fields are Python scalars: they are trace-time constants under `jax.jit`
(static shapes / unrolled offsets), mirroring the reference's compile-time
macros (reference: include/ComFunc.h:42-58, include/CVC.h:11-25,
include/PP.h:12-14).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class GIFConfig:
    """STEREO_GIF pipeline parameters (reference CPU float path).

    Defaults reproduce the reference golden path:
    CVC no-clamp (src/CVC.cpp:18-27) -> FastGuidedFilter s=4
    (src/DispEst.cpp:281-295) -> WTA d>=1 (src/DispSel.cpp:83-109) ->
    JointWMF r=9 (src/PP.cpp:402-425).
    """

    max_dis: int = 64            # reference: src/StereoMatch.cpp:30
    alpha: float = 0.9           # ALPHA_32F, include/CVC.h:23
    border_cost: float = 1.0     # BC_32F, include/CVC.h:12
    # TAU clamps exist in the reference OpenCL path only (assets/cvc.cl:17-18);
    # the CPU float path does NOT clamp (src/CVC.cpp:24-25). Kept configurable
    # to expose the OpenCL-variant semantics as a capability.
    tau1: float | None = None    # None = no clamp (CPU float semantics)
    tau2: float | None = None
    # The OpenCL host adds +0.5 to the Sobel gradients before CVC
    # (src/CVC_cl.cpp:108-111); the CPU float path does not. 0.0 = golden
    # CPU semantics; 0.5 = OpenCL-variant capability.
    grad_offset: float = 0.0
    gif_radius: int = 8          # GIF_R_WIN, include/ComFunc.h:49
    gif_eps: float = 1e-4        # GIF_EPS, include/ComFunc.h:50
    subsample: int = 4           # FGF s; cycles 2/4/8 via 's' key (src/main.cpp:186-193)
    med_sz: int = 19             # MED_SZ, include/PP.h:12 (JointWMF r = 19//2 = 9)
    wmf_sigma: float = 25.5      # JointWMF default sigma (include/JointWMF.h:81)
    wmf_n_feat: int = 256        # nF clusters (include/JointWMF.h:81)
    # 'exact': pairwise weights from 6-bit-quantized colors directly (no
    #          k-means approximation; strictly closer to the ideal weights).
    # 'table': use a precomputed (nF,nF) weight table + per-pixel feature
    #          index, bit-matching the reference featureIndexing+filterCore
    #          contract (include/JointWMF.h:494-660,173-408).
    wmf_mode: str = "exact"
    # 'auto': fused Pallas kernel on TPU, jnp tensor math elsewhere.
    # The kernel computes identical weights; only knife-edge median ties
    # (last-ulp cumulative sums) can differ (kernels/wmf_pallas.py).
    wmf_impl: str = "auto"       # auto | jnp | pallas
    # coefficient-map upsampling: 'lerp' gather lerp (bit-matches the CPU
    # golden path), 'mxu' banded-matrix matmuls on the systolic array
    # (ops/resize.py::resize_bilinear_mxu). 'auto' = mxu on TPU.
    upsample_impl: str = "auto"  # auto | lerp | mxu
    # upsample+WTA stage: 'pallas' = fused kernel (kernels/wta_pallas.py,
    # never materializes the upsampled maps), 'xla' = chunked einsum path.
    # 'auto' = pallas on TPU. Last-ulp argmin ties may differ between the
    # two (identical interpolation arithmetic, different summation paths).
    wta_impl: str = "auto"       # auto | xla | pallas
    # CVC construction on the fused Pallas tail: 'fused' computes the
    # sampled cost volume INSIDE the low-maps kernel from tiny polyphase
    # planes (kernels/cvc_lowmaps_pallas.py — the (D, h, w) volume never
    # exists in HBM; exact-stride columns only, e.g. 2K/HD720), 'xla'
    # materializes it via build_cost_volumes_sampled. 'auto' = fused
    # whenever the Pallas WTA path runs and the geometry qualifies.
    # Last-ulp float-contraction differences vs the XLA cost can move
    # knife-edge argmin ties (same tolerance class as wta_impl).
    cvc_impl: str = "auto"       # auto | xla | fused
    # FULL tail fusion: build the cost AND the coefficient-map chain
    # INSIDE the WTA kernel (kernels/cvc_wta_pallas.py) so neither the
    # cost volume nor the (4, D, h, w) maps tensor ever exists in HBM
    # (~1 GB written + ~4 GB re-read per view at 2K/d=256). Applies on
    # the Pallas WTA path at exact-stride phase-periodic geometries
    # (2K / HD720 / ZED) with f32 CVC; other shapes keep the
    # cvc_lowmaps + poly-WTA pair. Same last-ulp tolerance class as
    # wta_impl/cvc_impl (hardware parity measured 0 px at 2K).
    # DEFAULT 'maps': with the HBM traffic gone the fused kernel is
    # compute-bound on the maps-chain VPU stage (~20% efficient at these
    # block shapes; v5e round-5 ablation: chain+cost ~16, matmul ~3.9,
    # lerp ~3.0 ms/view at 2K). Measured full-pipeline A/B (v5e,
    # maps vs full, bitwise/tie-class identical outputs):
    #   2K/d=256    77.2 vs 80.3 ms   (maps wins)
    #   HD720/d=128 19.8 vs 19.4 ms   (fused edges out ~2%, noise-level)
    #   ZED/d=64     4.8 vs  5.0 ms   (maps wins)
    # — no monotone crossover, so the default stays 'maps'; 'full' opts
    # into the fused kernel, the right choice when HBM capacity/traffic
    # is the constraint (~150 MB/frame vs ~10 GB/frame) or under heavy
    # batching.
    tail_fusion: str = "maps"    # maps | full
    # 'u8' builds the cost volume with the reference's quantized uchar
    # OpenCL-kernel semantics (assets/cvc.cl:42-126 cvc_uchar_vx + the
    # CV_8U host prep of src/CVC_cl.cpp:125-131): u8 inputs/gradients,
    # integer /3 color normalization, TAU_US clamps, uchar cost — the
    # dead-in-reference capability surface, also an int8-throughput
    # experiment. The u8 volume feeds the float FGF at /255 scale (the
    # filter is linear in p, so WTA is scale-invariant). 'f32' is the
    # golden CPU-path semantics.
    cvc_dtype: str = "f32"       # f32 | u8
    # disparity-chunk depth of the fused WTA sweep — the runtime
    # parallelism-granularity knob (the reference's '1'-'8' thread-count
    # keys parallelize the same d loop, src/main.cpp:96-195 +
    # src/DispEst.cpp setThreads). Clamped to a divisor of max_dis; the
    # VMEM planner may shrink it further per shape. Results are invariant
    # (the argmin fold is chunk-order exact); only throughput changes.
    wta_d_chunk: int = 32
    sig_clr: float = 0.1         # SIG_CLR, include/PP.h:13 (wgtMedian)
    sig_dis: float = 9.0         # SIG_DIS, include/PP.h:14 (wgtMedian)
    # The reference ships lrCheck -> fillInv -> wgtMedian commented out
    # ahead of JointWMF (src/PP.cpp:405-413). True enables that full
    # toolchain (capability surface; improves occlusion handling).
    pp_toolchain: bool = False

    @property
    def fgf_low_radius(self) -> int:
        # reference: src/fastguidedfilter.cpp:206-208 (2*(r/s)+1, int division)
        return 2 * (self.gif_radius // self.subsample) + 1

    @property
    def wmf_radius(self) -> int:
        # reference: src/PP.cpp:421 ((int)MED_SZ/2 = 9)
        return self.med_sz // 2


@dataclasses.dataclass(frozen=True)
class SGBMConfig:
    """STEREO_SGBM parameters (reference: src/StereoMatch.cpp:639-660)."""

    min_disparity: int = 0
    num_disparities: int = 64
    block_size: int = 5
    p1: int = 8 * 3 * 25         # 8 * channels * SADWindowSize^2
    p2: int = 32 * 3 * 25
    disp12_max_diff: int = 1
    pre_filter_cap: int = 63
    uniqueness_ratio: int = 10
    speckle_window_size: int = 100
    speckle_range: int = 32
    mode: str = "hh"             # hh | sgbm | 3way ('m' key cycle, main.cpp:161-163)
    num_channels: int = 3
    agg_impl: str = "auto"       # auto | xla | pallas (aggregation scans)

    @property
    def num_directions(self) -> int:
        """MODE_HH = 8 directions, MODE_SGBM = the causal 5,
        MODE_SGBM_3WAY = {W->E, E->W, N->S} (the direction set OpenCV's
        SGBM3WayMainLoop aggregates; reference toggle src/main.cpp:161-163)."""
        try:
            return {"hh": 8, "sgbm": 5, "3way": 3}[self.mode]
        except KeyError:
            raise ValueError(f"unknown SGBM mode {self.mode!r}") from None


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Ground-truth %BP evaluation (reference: src/StereoMatch.cpp:275-311)."""

    error_threshold: int = 4     # src/StereoMatch.cpp:37
    max_dis: int = 64
    scale_factor: int = 4        # x4 Teddy/Cones, x3 2005 sets (src/StereoMatch.cpp:540,548)

    @property
    def threshold_value(self) -> int:
        # error_threshold * (CHAR_MAX / maxDis) in C integer arithmetic
        # (src/StereoMatch.cpp:281). CHAR_MAX=127.
        return self.error_threshold * (127 // self.max_dis)
