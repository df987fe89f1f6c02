"""Measured per-kernel roofline table (SCALING.md's "Measured kernel
efficiency" section; also `scripts/bench_suite.py --profile`).

For each benchmark config this runs the full jitted forward under a
jax.profiler trace and reads MEASURED per-HLO device times via xprof
(utils.profiling.collect_hlo_stats). Pallas kernels report achieved
bandwidth as (exact modeled HBM bytes) / (measured time): xprof carries
no byte counters for custom calls, but every kernel's DMA traffic is
deterministic from its launch geometry — the models below mirror the
planners in kernels/*.py. XLA ops report xprof's own measured hbm_bw.

Peaks: v5e HBM ~819 GB/s. Kernels well below the HBM roofline at high
VPU occupancy are compute(VPU)-bound — the table marks the boundedness
accordingly.

Usage: python scripts/kernel_roofline.py [--update-scaling-md]
"""

from __future__ import annotations

import pathlib
import re
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

HBM_PEAK = 819.0  # GB/s, v5e


def _round_up(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# exact byte models (mirror the kernel planners)
# ---------------------------------------------------------------------------

def gif_kernel_bytes(H, W, D, s=4):
    """Per-FRAME HBM bytes of the GIF Pallas kernels (both views)."""
    import jax

    from primestereomatch_tpu.kernels.cvc_lowmaps_pallas import _plan_th
    from primestereomatch_tpu.kernels.wta_pallas import (
        _poly_plan_dc,
        poly_col_params,
    )
    from primestereomatch_tpu.ops.resize import linear_coeffs, nearest_indices

    h = len(nearest_indices(H, H // s))
    w = len(nearest_indices(W, W // s))
    pp = poly_col_params(w, W)
    out = {}
    if pp is not None and pp["exact"]:
        qmax = D // s - 1
        M = 4
        WP = max(_round_up(w, 128), pp["out_wp"])
        WI = WP + 2 * M
        WB = _round_up(qmax + WP + 2 * M, 128)
        WT = pp["margin"] + WP
        TH = _plan_th(s, M, WI, WB, WT) or 16
        n_tiles = -(-h // TH)
        TI = TH + 2 * M
        HP = n_tiles * TH
        # fused CVC+lowmaps: per tile one read of planes/stats/view tiles,
        # maps written once
        reads = n_tiles * (4 * s * TI * WB + 17 * TI * WI) * 4
        writes = 4 * D * HP * WT * 4
        out["cvc_lowmaps (2 views)"] = 2 * (reads + writes)

        # poly WTA: slab reads per (row tile, chunk); disp written once
        TWQ, ntxq, margin, P = pp["TWQ"], pp["ntxq"], pp["margin"], pp["P"]
        CS = TWQ + 2 * margin
        sy, _ = linear_coeffs(h, H)
        THw = 32
        hp = _round_up(H, THw)
        nty = hp // THw
        syp = np.concatenate([sy, np.full(hp - H, sy[-1])])
        span = int(
            (syp[np.minimum(np.arange(nty) * THw + THw - 1, hp - 1)]
             - (syp[np.arange(nty) * THw] // 8) * 8).max()
        ) + 2
        RS = _round_up(8 + span, 8)
        DC = _poly_plan_dc(D, 32, RS, CS, THw, TWQ, P)
        slab = nty * ntxq * (D // DC) * 4 * DC * RS * CS * 4
        out["wta poly (2 views)"] = 2 * (slab + P * hp * ntxq * TWQ * 4)

    # WMF: 5 input planes with the extended-tile amplification + u8 out
    r = 9
    eh = _round_up(16 + 2 * r, 8)
    ew = _round_up(128 + 2 * r, 128)
    tiles = _round_up(H, 16) // 16 * (_round_up(W, 128) // 128)
    out["joint WMF (2 views)"] = 2 * tiles * (
        eh * ew * 4 * 5 + 16 * 128 * 4
    )
    return out


def sgbm_kernel_bytes(H, W, D):
    """Per-frame HBM bytes of the SGBM Pallas kernels."""
    Hp = _round_up(H, 128)
    Wp = _round_up(W, 128)
    out = {}
    # bt cost: int8 feature tiles (halo-expanded) in, int16 volume out
    TH, k = 16, 5
    GH = Hp // TH
    TI = _round_up(TH + k - 1, 8)
    out["bt block cost"] = GH * 2 * 9 * TI * Wp + D * Hp * Wp * 2
    # scans: the cost streams once per launch (x fwd / x bwd split +
    # y fwd-group / y bwd-group), 4 group outputs u16
    out["aggregation scans"] = 4 * (D * Hp * Wp * 2) + 4 * (D * Hp * Wp * 2)
    # select: single-pass packed-key kernel — 3 partials read ONCE
    out["select (partials)"] = 3 * (D * Hp * Wp * 2) + Hp * Wp * 4
    return out


# ---------------------------------------------------------------------------

def classify(recs, patterns):
    """Group xprof rows by (name regex, optional expression regex) ->
    {group: {ms, gbps}}. Pallas kernels often share the enclosing jit's
    name (stereo_gif_forward.N), so the HLO expression (result
    dtype/shape) disambiguates them."""
    groups = {}
    other_ms = 0.0
    for rec in recs:
        name = str(rec["name"])
        expr = str(rec.get("expression") or "")
        ms = rec["total_self_us"] / 1e3
        for entry in patterns:
            gname, name_pat = entry[0], entry[1]
            expr_pat = entry[2] if len(entry) > 2 else None
            if re.match(name_pat, name) and (
                expr_pat is None or re.search(expr_pat, expr)
            ):
                g = groups.setdefault(gname, {"ms": 0.0, "gbps": []})
                g["ms"] += ms
                if rec["hbm_gbps"]:
                    g["gbps"].append(rec["hbm_gbps"])
                break
        else:
            other_ms += ms
    return groups, other_ms


def profile_config(name, fn, args, steps=4):
    from primestereomatch_tpu.utils.profiling import collect_hlo_stats

    recs = collect_hlo_stats(fn, args, steps=steps, warmup=1)
    for r in recs:
        r["total_self_us"] /= steps
    return recs


def run(update_scaling_md=False):
    import jax
    import jax.numpy as jnp

    from primestereomatch_tpu.config import GIFConfig, SGBMConfig
    from primestereomatch_tpu.models.gif_pipeline import stereo_gif_forward
    from primestereomatch_tpu.models.sgbm_pipeline import stereo_sgbm_forward
    from primestereomatch_tpu.utils.datasets import load_dataset

    teddy = load_dataset("Teddy")

    def tiled(img, hw):
        Ht, Wt = hw
        reps = (Ht // img.shape[0] + 1, Wt // img.shape[1] + 1, 1)
        return np.tile(img, reps)[:Ht, :Wt]

    gif_patterns = [
        ("joint WMF (2 views)", r"joint_wmf_pallas"),
        # maps producer: 4-D f32 (4, D, HP, WT) result; WTA: s32 result
        ("cvc_lowmaps (2 views)", r".*", r"= f32\[4,\d+,\d+,\d+\].*custom-call"),
        ("lowmaps (2 views)", r"fgf_low_maps_pallas"),
        ("wta poly (2 views)", r"stereo_gif_forward|_lambda_",
         r"= s32\[.*custom-call"),
    ]
    sgbm_patterns = [
        ("bt block cost", r"bt_block_cost"),
        ("aggregation scans", r"sgbm_aggregate"),
        ("select (partials)", r"stereo_sgbm_forward"),
        ("speckle sweeps", r"segmin_sweep"),
        ("speckle area sorts", r"sort"),
    ]

    lines = []

    def emit(header, recs, patterns, byte_models, frame_ms):
        lines.append(f"\n### {header} (measured, v5e single chip)\n")
        lines.append(
            "| kernel | ms/frame | HBM GB | GB/s | % HBM peak | bound |"
        )
        lines.append("|---|---|---|---|---|---|")
        groups, other = classify(recs, patterns)
        for gname, g in sorted(groups.items(), key=lambda kv: -kv[1]["ms"]):
            ms = g["ms"]
            if gname in byte_models:
                gb = byte_models[gname] / 1e9
                gbps = gb / (ms / 1e3)
                frac = 100.0 * gbps / HBM_PEAK
                bound = "VPU" if frac < 50 else "HBM"
                lines.append(
                    f"| {gname} | {ms:.2f} | {gb:.2f} | {gbps:.0f} | "
                    f"{frac:.0f}% | {bound} |"
                )
            else:
                gbps = max(g["gbps"], default=0.0)
                lines.append(
                    f"| {gname} | {ms:.2f} | — | {gbps:.0f} (xprof) | "
                    f"{100.0 * gbps / HBM_PEAK:.0f}% | — |"
                )
        lines.append(f"| XLA glue (everything else) | {other:.2f} | | | | HBM |")
        lines.append(f"| **total device** | **{frame_ms:.2f}** | | | | |")

    for cname, (Hc, Wc, Dc) in (
        ("GIF Teddy 450x375 d=64", (375, 450, 64)),
        ("GIF 2K 2208x1242 d=256", (1242, 2208, 256)),
    ):
        l_img = jnp.asarray(tiled(teddy.left_f32, (Hc, Wc)))
        r_img = jnp.asarray(tiled(teddy.right_f32, (Hc, Wc)))
        cfg = GIFConfig(max_dis=Dc)
        f = jax.jit(lambda a, b, c=cfg: stereo_gif_forward(a, b, c))
        _ = f(l_img, r_img)
        recs = profile_config(cname, f, (l_img, r_img))
        frame_ms = sum(r["total_self_us"] for r in recs) / 1e3
        emit(cname, recs, gif_patterns, gif_kernel_bytes(Hc, Wc, Dc), frame_ms)
        print(f"{cname}: device total {frame_ms:.2f} ms", flush=True)

    for cname, (Hc, Wc, Dc) in (
        ("SGBM Teddy 450x375 d=64", (375, 450, 64)),
        ("SGBM 2K 2208x1242 d=256", (1242, 2208, 256)),
    ):
        lu = jnp.asarray(tiled(teddy.left_bgr, (Hc, Wc)))
        ru = jnp.asarray(tiled(teddy.right_bgr, (Hc, Wc)))
        scfg = SGBMConfig(num_disparities=Dc)
        fs = jax.jit(lambda a, b, c=scfg: stereo_sgbm_forward(a, b, c))
        _ = fs(lu, ru)
        recs = profile_config(cname, fs, (lu, ru))
        frame_ms = sum(r["total_self_us"] for r in recs) / 1e3
        emit(cname, recs, sgbm_patterns, sgbm_kernel_bytes(Hc, Wc, Dc),
             frame_ms)
        print(f"{cname}: device total {frame_ms:.2f} ms", flush=True)

    table = "\n".join(lines) + "\n"
    print(table)
    if update_scaling_md:
        path = pathlib.Path(__file__).resolve().parents[1] / "SCALING.md"
        text = path.read_text()
        begin = "<!-- measured-kernels:begin -->"
        end = "<!-- measured-kernels:end -->"
        if begin in text:
            text = re.sub(
                re.escape(begin) + r".*?" + re.escape(end),
                begin + "\n" + table + end,
                text,
                flags=re.S,
            )
        else:
            text += (
                "\n## Measured kernel efficiency "
                "(scripts/kernel_roofline.py)\n\n"
                "Per-kernel device times from xprof traces; Pallas kernels'\n"
                "bandwidth = exact modeled DMA bytes / measured time (xprof\n"
                "carries no byte counters for custom calls); XLA ops report\n"
                "xprof's measured hbm_bw. 'VPU' bound = well under the HBM\n"
                "roofline at full occupancy — more bandwidth would not help.\n"
                + begin + "\n" + table + end + "\n"
            )
        path.write_text(text)
        print("SCALING.md updated")


if __name__ == "__main__":
    run(update_scaling_md="--update-scaling-md" in sys.argv)
