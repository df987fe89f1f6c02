"""Application orchestrator — the reference StereoMatch layer, headless.

Maps the reference's L4 orchestrator (src/StereoMatch.cpp) onto a
library-friendly engine:

  * media modes DE_IMAGE / DE_VIDEO (StereoMatch.h:16-17) -> 'image'/'video'
  * per-frame capture -> (rectify+crop) -> algorithm dispatch -> GT eval ->
    display mosaic (compute, src/StereoMatch.cpp:118-318)
  * dataset switching (update_dataset, :528-608)
  * runtime toggles: algorithm, mask mode, subsample rate, error threshold
    (the reference's HCI keys, src/main.cpp:96-195)
  * per-stage timing monitors (:209-242, 255-268)

The compute hot path stays fully jitted; this layer is thin host-side
orchestration (numpy in, numpy out).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from primestereomatch_tpu.config import GIFConfig, SGBMConfig
from primestereomatch_tpu.utils.datasets import (
    DATASETS,
    MASK_DISC,
    MASK_NONE,
    MASK_NONOCC,
    StereoSample,
    load_dataset,
)
from primestereomatch_tpu.utils.display import build_mosaic, disp_to_u8
from primestereomatch_tpu.utils.eval import BPResult, bad_pixel_metrics

_MASKS = {"none": MASK_NONE, "nonocc": MASK_NONOCC, "disc": MASK_DISC}


@dataclasses.dataclass
class AppConfig:
    alg: str = "STEREO_GIF"          # required -a/--alg (src/StereoMatch.cpp:745-751)
    media_mode: str = "image"        # image | video
    dataset: str = "Cones"           # default dataset_names[2] (StereoMatch.h:28)
    left: str | None = None          # user-supplied image-mode files
    right: str | None = None
    gt: str | None = None
    gt_scale: int = 4
    max_dis: int = 64                # src/StereoMatch.cpp:30
    subsample: int = 4               # FGF s ('s' key cycles 2/4/8)
    med_sz: int = 19
    error_threshold: int = 4         # src/StereoMatch.cpp:37
    mask_mode: str = "nonocc"        # none | nonocc | disc ('o' key)
    video_source: str = "synthetic"  # video mode frame source spec
    calib_dir: str | None = None     # rectify video frames when set
    calib_size: tuple[int, int] = (1280, 720)  # native size of the shipped YMLs
    timed: bool = False              # per-stage timing monitors
    out_dir: str | None = None       # write mosaic PNGs here


@dataclasses.dataclass
class FrameResult:
    l_disp: np.ndarray               # (H, W) uint8 raw disparities
    r_disp: np.ndarray
    left_bgr: np.ndarray
    right_bgr: np.ndarray
    times_ms: dict[str, float]
    metrics: BPResult | None
    frame_index: int

    @property
    def fps(self) -> float:
        total = self.times_ms.get("total", sum(self.times_ms.values()))
        return 1000.0 / total if total else float("inf")


class StereoMatchApp:
    def __init__(self, cfg: AppConfig):
        import jax.numpy as jnp

        self._jnp = jnp
        self.cfg = cfg
        self.frame_index = 0
        self._sample: StereoSample | None = None
        self._source = None
        self._rectifier = None

        if cfg.media_mode == "image":
            if cfg.left:
                from primestereomatch_tpu.utils.datasets import (
                    _imread_color,
                    _imread_gray,
                )

                self._sample = StereoSample(
                    name="User",
                    left_bgr=_imread_color(cfg.left),
                    right_bgr=_imread_color(cfg.right),
                    gt=_imread_gray(cfg.gt) if cfg.gt else None,
                    mask_nonocc=None,
                    mask_disc=None,
                    scale_factor=cfg.gt_scale,
                    default_mask=MASK_NONE,
                )
            else:
                self._sample = load_dataset(cfg.dataset)
        elif cfg.media_mode == "video":
            from primestereomatch_tpu.utils.video import open_source

            self._source = open_source(cfg.video_source)
            if cfg.calib_dir:
                from primestereomatch_tpu.calib import (
                    Rectifier,
                    load_stereo_calibration,
                )

                calib = load_stereo_calibration(
                    f"{cfg.calib_dir}/intrinsics.yml",
                    f"{cfg.calib_dir}/extrinsics.yml",
                )
                # size resolved lazily from the first frame
                self._calib = calib
        else:
            raise ValueError(f"unknown media_mode {cfg.media_mode!r}")

        self._build_engines()

    # -- engine management ---------------------------------------------------

    def _build_engines(self):
        from primestereomatch_tpu.models.gif_pipeline import DispEst, stereo_gif_forward
        from primestereomatch_tpu.models.sgbm_pipeline import stereo_sgbm_forward

        # impl/mode prefs survive engine rebuilds (e.g. subsample changes)
        impl = getattr(self, "gif_impl", "auto")
        self.gif_cfg = GIFConfig(
            max_dis=self.cfg.max_dis,
            subsample=self.cfg.subsample,
            med_sz=self.cfg.med_sz,
            wta_impl=impl, wmf_impl="jnp" if impl == "xla" else impl,
            wta_d_chunk=getattr(self, "_wta_d_chunk", 32),
        )
        self.sgbm_cfg = SGBMConfig(
            num_disparities=self.cfg.max_dis,
            mode=getattr(self, "_sgbm_mode", "hh"),
        )
        self._gif_forward = stereo_gif_forward
        self._sgbm_forward = stereo_sgbm_forward
        self._dispest = DispEst(self.gif_cfg)

    def set_algorithm(self, alg: str):
        """'a' key: toggle STEREO_GIF <-> STEREO_SGBM (src/main.cpp:103-131)."""
        if alg not in ("STEREO_GIF", "STEREO_SGBM"):
            raise ValueError(alg)
        self.cfg.alg = alg

    def toggle_sgbm_mode(self) -> str:
        """'m' key (SGBM): cycle MODE_HH -> MODE_SGBM -> MODE_SGBM_3WAY
        (src/main.cpp:161-163). Returns the new mode. jit caches per
        num_directions, so revisited modes re-dispatch without recompiling."""
        nxt = {"hh": "sgbm", "sgbm": "3way", "3way": "hh"}[self.sgbm_cfg.mode]
        self._sgbm_mode = nxt
        self.sgbm_cfg = dataclasses.replace(self.sgbm_cfg, mode=nxt)
        return nxt

    def toggle_gif_impl(self) -> str:
        """'m' key (GIF): toggle Pallas <-> XLA kernels — the TPU analog of
        the reference's OpenCL <-> pthreads switch (src/main.cpp:152-159).
        Returns the new impl name."""
        import jax

        cur = getattr(self, "gif_impl", "auto")
        if cur == "auto":
            cur = "pallas" if jax.default_backend() == "tpu" else "xla"
        nxt = "xla" if cur == "pallas" else "pallas"
        if nxt == "pallas" and jax.default_backend() != "tpu":
            # reference parity: 'm' without an OpenCL device refuses too
            # (src/main.cpp:157-159)
            return "xla (platform has no TPU device for Pallas kernels)"
        self.gif_impl = nxt
        self._build_engines()
        return self.gif_impl

    def set_subsample(self, s: int):
        """'s' key: FGF subsample rate 2/4/8 (src/main.cpp:186-193)."""
        self.cfg.subsample = s
        self._build_engines()

    def set_parallelism(self, level: int) -> int:
        """'1'-'8' keys: runtime parallelism granularity — the analog of the
        reference's live CPU thread count (src/main.cpp:96-195 dispatch to
        DispEst::setThreads; its threads split the SAME disparity loop).
        Level k sets the fused-WTA disparity-chunk depth to 2^(k-1)
        (1..128), clamped to a divisor of max_dis. Returns the applied
        chunk depth. Results are invariant; only throughput changes."""
        if not 1 <= level <= 8:
            raise ValueError(f"parallelism level must be 1..8, got {level}")
        self._wta_d_chunk = 1 << (level - 1)
        self._build_engines()
        from primestereomatch_tpu.models.gif_pipeline import _wta_dc

        return _wta_dc(self.gif_cfg)

    def set_mask_mode(self, mode: str):
        """'o' key: cycle evaluation mask (src/main.cpp:172-185)."""
        if mode not in _MASKS:
            raise ValueError(mode)
        self.cfg.mask_mode = mode

    def update_dataset(self, name: str):
        """'d' key: switch Middlebury dataset (src/StereoMatch.cpp:528-608).
        Re-binding the engine is free here — jit caches per shape/config."""
        if name not in DATASETS:
            raise ValueError(f"unknown dataset {name!r}")
        self.cfg.dataset = name
        self._sample = load_dataset(name)

    # -- per-frame compute ---------------------------------------------------

    def _capture(self) -> tuple[np.ndarray, np.ndarray]:
        if self._sample is not None:
            return self._sample.left_bgr, self._sample.right_bgr
        l_bgr, r_bgr = next(self._source)
        if self.cfg.calib_dir:
            if self._rectifier is None:
                from primestereomatch_tpu.calib import Rectifier

                h, w = l_bgr.shape[:2]
                self._rectifier = Rectifier(
                    self._calib, (w, h), calib_size=self.cfg.calib_size
                )
            jnp = self._jnp
            l, r = self._rectifier(jnp.asarray(l_bgr), jnp.asarray(r_bgr))
            return np.asarray(l), np.asarray(r)
        return l_bgr, r_bgr

    def _fetch(self, x) -> np.ndarray:
        # device->host fetch doubles as the synchronization point
        return np.asarray(x)

    def compute(self) -> FrameResult:
        jnp = self._jnp
        times: dict[str, float] = {}
        t_total = time.perf_counter()

        l_bgr, r_bgr = self._capture()

        if self.cfg.alg == "STEREO_GIF":
            l_f = jnp.asarray(l_bgr.astype(np.float32) * np.float32(1 / 255.0))
            r_f = jnp.asarray(r_bgr.astype(np.float32) * np.float32(1 / 255.0))
            if self.cfg.timed:
                e = self._dispest
                t0 = time.perf_counter()
                lcv, rcv = e.cost_const(l_f, r_f)
                self._fetch(lcv[0, 0, :1])
                times["CVC"] = (time.perf_counter() - t0) * 1e3
                t0 = time.perf_counter()
                lcv = e.cost_filter(l_f, lcv)
                rcv = e.cost_filter(r_f, rcv)
                self._fetch(lcv[0, 0, :1])
                times["CVF"] = (time.perf_counter() - t0) * 1e3
                t0 = time.perf_counter()
                ld = e.disp_select(lcv)
                rd = e.disp_select(rcv)
                self._fetch(ld[0, :1])
                times["DispSel"] = (time.perf_counter() - t0) * 1e3
                t0 = time.perf_counter()
                ld = e.post_process(ld, l_f)
                rd = e.post_process(rd, r_f)
                l_disp = self._fetch(ld)
                r_disp = self._fetch(rd)
                times["PP"] = (time.perf_counter() - t0) * 1e3
            else:
                ld, rd = self._gif_forward(l_f, r_f, self.gif_cfg)
                l_disp = self._fetch(ld)
                r_disp = self._fetch(rd)
        else:  # STEREO_SGBM
            from primestereomatch_tpu.models.sgbm_pipeline import sgbm_display_u8

            d16 = self._sgbm_forward(
                jnp.asarray(l_bgr), jnp.asarray(r_bgr), self.sgbm_cfg
            )
            l_disp = self._fetch(sgbm_display_u8(d16, 1, self.cfg.max_dis))
            r_disp = np.zeros_like(l_disp)  # the reference's SGBM is left-only

        times["total"] = (time.perf_counter() - t_total) * 1e3

        metrics = None
        sample = self._sample
        if sample is not None and sample.gt is not None:
            mask_mode = _MASKS[self.cfg.mask_mode]
            mask = None
            mask_is_disc = False
            if mask_mode == MASK_NONOCC and sample.mask_nonocc is not None:
                mask = sample.mask_nonocc
            elif mask_mode == MASK_DISC and sample.mask_disc is not None:
                mask = sample.mask_disc
                mask_is_disc = True
            metrics = bad_pixel_metrics(
                l_disp, sample.gt, sample.scale_factor, self.cfg.max_dis,
                error_threshold=self.cfg.error_threshold,
                mask=mask, mask_is_disc=mask_is_disc,
            )

        self.frame_index += 1
        return FrameResult(
            l_disp=l_disp, r_disp=r_disp,
            left_bgr=l_bgr, right_bgr=r_bgr,
            times_ms=times, metrics=metrics,
            frame_index=self.frame_index - 1,
        )

    def stream(self, frames: int):
        """Pipelined frame iterator: dispatch frame n+1 to the device while
        frame n's results transfer back — the reference's free-running
        compute-thread pattern (src/main.cpp:40-73) realized with async
        device dispatch + the native prefetching decoder. GIF-only fast
        path; falls back to compute() otherwise. Yields FrameResult."""
        if self.cfg.alg != "STEREO_GIF" or self.cfg.timed:
            for _ in range(frames):
                yield self.compute()
            return

        jnp = self._jnp
        state = {"exhausted": False, "submitted": 0}

        def dispatch():
            if state["exhausted"] or state["submitted"] >= frames:
                return None
            try:
                l_bgr, r_bgr = self._capture()
            except StopIteration:
                state["exhausted"] = True
                return None
            l_f = jnp.asarray(l_bgr.astype(np.float32) * np.float32(1 / 255.0))
            r_f = jnp.asarray(r_bgr.astype(np.float32) * np.float32(1 / 255.0))
            t0 = time.perf_counter()
            ld, rd = self._gif_forward(l_f, r_f, self.gif_cfg)
            state["submitted"] += 1
            idx = self.frame_index
            self.frame_index += 1
            return (ld, rd, l_bgr, r_bgr, t0, idx)

        pending = dispatch()
        emitted = 0
        while pending is not None and emitted < frames:
            nxt = dispatch()  # next frame in flight before fetching this one
            ld, rd, l_bgr, r_bgr, t0, idx = pending
            l_disp = self._fetch(ld)
            r_disp = self._fetch(rd)
            dt = (time.perf_counter() - t0) * 1e3
            yield FrameResult(
                l_disp=l_disp, r_disp=r_disp,
                left_bgr=l_bgr, right_bgr=r_bgr,
                times_ms={"total": dt}, metrics=None, frame_index=idx,
            )
            emitted += 1
            pending = nxt

    # -- output --------------------------------------------------------------

    def mosaic(self, res: FrameResult) -> np.ndarray:
        sf = self._sample.scale_factor if self._sample else 1
        gt = self._sample.gt if self._sample else None
        err = res.metrics.err_map if res.metrics else None
        return build_mosaic(
            res.left_bgr, res.right_bgr,
            disp_to_u8(res.l_disp, sf), disp_to_u8(res.r_disp, sf),
            gt=gt, err_map=err,
        )

    def report(self, res: FrameResult) -> str:
        """One status line per frame, like the reference's printf stream."""
        parts = [f"frame {res.frame_index}", f"alg {self.cfg.alg}"]
        for k, v in res.times_ms.items():
            parts.append(f"{k} {v:.1f}ms")
        if res.metrics is not None:
            parts.append(f"%BP({self.cfg.mask_mode}) {res.metrics.percent_bad_pixels:.2f}")
            parts.append(f"avgErr {res.metrics.avg_err:.2f}")
        return " | ".join(parts)
