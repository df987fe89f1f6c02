"""Profiling / tracing utilities (SURVEY §5.1).

The reference's two mechanisms — wall-clock stage timers with a running
CVC average (src/StereoMatch.cpp:209-268, ComFunc.h get_rt) and per-kernel
device profiling (oclUtil printProfilingInfo) — map here to:

  * StageTimers: accumulating per-stage wall timers with running averages;
  * trace(): context manager around jax.profiler for device-level traces
    viewable in TensorBoard/XProf (the XLA-native replacement for
    CL_QUEUE_PROFILING_ENABLE event dumps);
  * gif_hbm_roofline(): the memory-bound speed-of-light estimate for the
    STEREO_GIF frame, to report achieved fraction of HBM bandwidth.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@dataclasses.dataclass
class _Stage:
    total_ms: float = 0.0
    count: int = 0
    last_ms: float = 0.0

    @property
    def avg_ms(self) -> float:
        return self.total_ms / self.count if self.count else 0.0


class StageTimers:
    """Per-stage wall timers with running averages (the reference prints
    CVC's running average every frame, src/StereoMatch.cpp:209-218)."""

    def __init__(self):
        self.stages: dict[str, _Stage] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        ms = (time.perf_counter() - t0) * 1e3
        s = self.stages.setdefault(name, _Stage())
        s.total_ms += ms
        s.count += 1
        s.last_ms = ms

    def report(self) -> str:
        return " | ".join(
            f"{k} {v.last_ms:.1f}ms (avg {v.avg_ms:.1f})"
            for k, v in self.stages.items()
        )


@contextlib.contextmanager
def trace(log_dir: str):
    """Device-level profiler trace (open in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def collect_hlo_stats(fn, args, steps: int = 5, warmup: int = 2):
    """Run `fn(*args)` under a jax.profiler trace and return MEASURED
    per-HLO-op device stats (the reference's CL_QUEUE_PROFILING_ENABLE
    event dump, oclUtil.cpp:137-174, reborn as XLA oper stats).

    Returns a list of dicts sorted by total self time, each with:
      name, category, occurrences, avg_self_us (per occurrence),
      total_self_us, hbm_gbps (measured), flop_rate (GFLOP/s, model),
      bound_by ('hbm' / 'compute' / ...), dma_stall_pct.

    Requires the `xprof` package (baked into this image) to parse the
    xplane protobuf; raises RuntimeError if the trace captured no device
    plane (e.g. CPU backend traces carry no per-op HBM counters).
    """
    import glob
    import json
    import tempfile

    import jax
    import numpy as np

    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])

    d = tempfile.mkdtemp(prefix="psm_hlo_stats_")
    jax.profiler.start_trace(d)
    for _ in range(steps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    jax.profiler.stop_trace()

    pbs = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    if not pbs:
        raise RuntimeError(f"no xplane.pb produced under {d}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(pbs, "hlo_stats", {})
    j = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in j["cols"]]
    recs = []
    for r in j.get("rows", []):
        rec = dict(zip(cols, [c["v"] for c in r["c"]]))
        occ = float(rec.get("occurrences") or 0) or 1.0
        recs.append(
            {
                "name": rec.get("hlo_op_name"),
                "category": rec.get("category"),
                "expression": rec.get("hlo_op_expression"),
                # jit scope path (`jit(entry)/.../pallas_call`) + source
                # file — how Pallas custom calls are attributed BY NAME in
                # scripts/kernel_roofline.py
                "tf_op_name": rec.get("tf_op_name"),
                "source_info": rec.get("source_info"),
                "occurrences": occ,
                "total_self_us": float(rec.get("total_self_time") or 0.0),
                "avg_self_us": float(rec.get("total_self_time") or 0.0) / occ,
                "hbm_gbps": float(rec.get("hbm_bw") or 0.0),
                "mem_gbps": float(rec.get("measured_memory_bw") or 0.0),
                "flop_rate": float(rec.get("model_flop_rate") or 0.0),
                "bound_by": rec.get("bound_by"),
                "dma_stall_pct": float(rec.get("dma_stall_percent") or 0.0),
            }
        )
    recs.sort(key=lambda r: -r["total_self_us"])
    return recs


def gif_hbm_bytes(height: int, width: int, max_dis: int, subsample: int,
                  wmf_radius: int = 9) -> int:
    """Minimum HBM traffic for one STEREO_GIF frame (both views), assuming
    perfect fusion: inputs once, the low-res volume once each way through
    the filter chain, the filtered full-res volume once into WTA, and the
    WMF tiles once. This is the denominator for a speed-of-light claim."""
    h, w = height // subsample, width // subsample
    f32 = 4
    img = height * width * 3 * f32 * 2                 # both views read
    low_volume = max_dis * h * w * f32 * 2 * 2         # build + filter read
    # upsampled (a, b) maps consumed at full res by q/WTA: 4 maps per view
    q_inputs = 4 * max_dis * h * w * f32 * 2
    q_stream = max_dis * height * width * f32 * 2      # q evaluated into argmin
    disp = height * width * 2                          # uint8 out, both views
    wmf = (height * width * (1 + 3 + 4) + disp) * 2    # tiles in, disp out
    return img + low_volume + q_inputs + q_stream + wmf


def hbm_roofline_fraction(frame_seconds: float, height: int, width: int,
                          max_dis: int, subsample: int,
                          hbm_gbps: float = 819.0) -> float:
    """Fraction of HBM speed-of-light achieved (v5e ~819 GB/s default)."""
    needed = gif_hbm_bytes(height, width, max_dis, subsample)
    sol = needed / (hbm_gbps * 1e9)
    return sol / frame_seconds
