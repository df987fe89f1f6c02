"""Measured per-kernel roofline table (SCALING.md's "Measured kernel
efficiency" section; also `scripts/bench_suite.py --profile`).

For each benchmark config this runs the full jitted forward under a
jax.profiler trace and reads MEASURED per-HLO device times via xprof
(utils.profiling.collect_hlo_stats). Pallas kernels are identified BY
NAME — xprof's tf_op_name carries `jit(<entry>)/.../pallas_call` and
source_info carries the kernel file, so every custom call is attributed
to exactly one kernel row and never lumped into a neighbour (the old
result-shape regexes folded cvc_lowmaps into the WTA row at 2K).

Two roofline columns per kernel:
  * HBM:  achieved bandwidth = (exact modeled DMA bytes) / (measured
    time) vs the v5e ~819 GB/s peak. xprof carries no byte counters for
    custom calls, so the byte models below mirror the kernel planners.
  * VPU:  %VPU = (mix-calibrated model time) / (measured time). The
    round-4 single-FMA peak left rows reading >100% — a kernel cannot
    exceed peak, so the accounting was wrong: the VPU multi-issues
    simple ops (measured cmp+sel+mul step == one FMA step) and exp costs
    ~1.5 FMA-ops, not the ~8 the old model charged. Round 5 measures
    per-mix issue rates with micro-kernels (scripts/vpu_peak.py: fma
    2.7, pure-add 2.0, cmp/sel 4.0, int 4.4 T counted-ops/s; the WMF
    weight step verbatim at 0.42 G-steps/s) and models each kernel's
    MINIMUM time from its own primitive mix — %VPU <= 100 by
    construction up to model error. Error band: the micro-kernels have
    perfect ILP and no per-offset shifts/loads, so the model time is a
    LOWER bound and %VPU a lower bound on true utilization (~10-20%
    optimistic for shift-heavy inner loops). Gops still reports the raw
    counted ops (FMA = 2, exp = 1) for continuity.

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
        CS = pp["cs"]
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
# vector-op models: raw per-element counts from the kernel sources
# (FMA = 2 ops, exp = 1) PLUS a mix-calibrated minimum-time model using
# the measured per-primitive issue rates (scripts/vpu_peak.py mixes).
# MXU matmuls, transposes/relayouts and DMA are excluded. Each model
# returns {row: (raw_ops, model_time_s)}.
# ---------------------------------------------------------------------------

def _mix_rates():
    from scripts.vpu_peak import mix_data

    m = mix_data()["mixes"]
    return {
        "fma": m["fma"]["ops_per_s"],           # mul/add pairs, 2 per FMA
        "add": m["add"]["ops_per_s"],           # dependent single adds
        "simple": m["cmpsel"]["ops_per_s"],     # cmp/sel/mul multi-issue
        "int": m["int_minadd"]["ops_per_s"],    # int add/min/mul
        "wmfw_steps": m["wmf_weight"]["steps_per_s"],  # WMF weight step
    }


def gif_kernel_vops(H, W, D, s=4, wmf_radius=9, n_bins=None):
    """GIF kernels: {row: (raw counted ops, calibrated min time s)}."""
    from primestereomatch_tpu.kernels.wta_pallas import poly_col_params
    from primestereomatch_tpu.ops.resize import nearest_indices

    r = _mix_rates()
    n_bins = n_bins or D
    w = len(nearest_indices(W, W // s))
    pp = poly_col_params(w, W)
    out = {}
    if pp is not None:
        # _wta_kernel_poly per (d, output px):
        #   exact-static mode: 2 guide combines (3 FMA + 1 add each -> 14
        #   counted, FMA-rate) + lerp (3, FMA-rate) + chunk min/argmin
        #   fold (~3 simple);  masked mode adds 2 more combines + 4 tap
        #   selects (simple)
        n = 2 * H * W * D
        if pp["exact"]:
            raw = n * 18.0
            t = n * (15.0 / r["fma"] + 3.0 / r["simple"])
        else:
            raw = n * 34.0
            t = n * (15.0 / r["fma"] + 19.0 / r["simple"])
        out["wta poly (2 views)"] = (raw, t)
    # _wmf_kernel per px: pass 1 per window offset is EXACTLY the
    # measured wmf_weight micro-step (3 sub, 3 FMA-ish, exp, weighted
    # acc — 12 counted with exp = 1); pass 2 per probe per offset:
    # convert + cmp + select + acc = 4 simple, probes <= log2(n_bins)
    # (the bounded search usually does fewer -> model time is a floor).
    win = 2 * wmf_radius + 1
    probes = float(np.ceil(np.log2(max(n_bins, 2))))
    n_off = 2 * H * W * win * win
    out["joint WMF (2 views)"] = (
        n_off * (12 + probes * 4),
        n_off * (1.0 / r["wmfw_steps"] + probes * 4 / r["simple"]),
    )
    # cvc_lowmaps per (d, low px): pair cost ~17 (abs/min/sel — simple),
    # then the box/solve/box chain ~60: ~45 dependent box adds (add-rate)
    # + ~15 solve FMAs
    h, wl = H // s, W // s
    n = 2 * D * h * wl
    chain_t = 45.0 / r["add"] + 15.0 / r["fma"]
    out["cvc_lowmaps (2 views)"] = (n * 77.0, n * (17.0 / r["simple"] + chain_t))
    out["lowmaps (2 views)"] = (n * 60.0, n * chain_t)
    return out


def sgbm_kernel_vops(H, W, D):
    """SGBM kernels: {row: (raw counted ops, calibrated min time s)} —
    integer pipelines, modeled at the measured int-mix issue rate
    (rolls/relayouts counted as one op per element moved)."""
    r = _mix_rates()
    out = {}
    # _bt_cost_kernel per (d, px): the 9-plane lane roll (9), BT math
    # c1/c2/m3/pc over 3 channels (3 x (4 max/min + 2 sub) + 2 adds =
    # 20), edge patches (2), vertical 5-tap sum (4), horizontal sum
    # (2 rolls + 2 selects + 4 adds = 8), store cast (1) ~ 44
    out["bt block cost"] = (
        float(H) * W * D * 44, float(H) * W * D * 44 / r["int"]
    )
    # _sgbm_scan_kernel per (d, px, lane): min-reduce share (~1), d+-1
    # sublane rolls + masks (6), 3-way min chain + p-adds (5), L update
    # + casts (4), group-sum add (1) ~ 17; 8 directions = 8 lane-passes.
    # NOTE the scans' 3-way min chain is latency-chained (the recurrence),
    # so the int-mix rate (16 independent chains) overestimates a bit.
    out["aggregation scans"] = (
        float(H) * W * D * 8 * 17, float(H) * W * D * 8 * 17 / r["int"]
    )
    # _select_kernel_1p per (d, px): partial adds (2), key pack (2),
    # s_m/s_p/pend selects (3), best cmp+min (2), top-4 insertion
    # network (8) ~ 17, plus the OCV epilogue walk/lookups ~5/D' per px
    out["select (partials)"] = (
        float(H) * W * D * 17, float(H) * W * D * 17 / r["int"]
    )
    return out


# ---------------------------------------------------------------------------

# Pallas entry name -> display row. Entry names come from tf_op_name's
# innermost jit(...) (the @jax.jit wrapper around each kernel entry) or,
# when the entry is not jitted by itself, from the kernel file in
# source_info. Unmatched Pallas kernels get their raw entry name as the
# row label — a kernel can never silently land in "XLA glue".
PALLAS_LABELS = [
    (r"fgf_wta_pallas|wta_pallas", "wta poly (2 views)"),
    (r"joint_wmf_pallas|wmf_pallas", "joint WMF (2 views)"),
    (r"cvc_fgf_low_maps|cvc_lowmaps", "cvc_lowmaps (2 views)"),
    (r"fgf_low_maps|lowmaps_pallas", "lowmaps (2 views)"),
    (r"bt_block_cost", "bt block cost"),
    (r"sgbm_aggregate|sgbm_scan|sgbm_pallas", "aggregation scans"),
    (r"select_disparity|select_pallas", "select (partials)"),
    (r"segmin_sweep|speckle_pallas", "speckle sweeps"),
]


def kernel_label(rec):
    """Resolve an xprof row to its Pallas kernel row label, or None for
    plain XLA ops."""
    tf = str(rec.get("tf_op_name") or "")
    if "pallas_call" not in tf:
        return None
    jits = re.findall(r"jit\(([^)]+)\)", tf)
    entry = next(
        (j for j in reversed(jits) if j not in ("<lambda>", "_lambda_")),
        None,
    )
    src = str(rec.get("source_info") or "")
    m = re.search(r"kernels/([a-z0-9_]+)\.py", src)
    file_key = m.group(1) if m else None
    for pat, label in PALLAS_LABELS:
        if (entry and re.search(pat, entry)) or (
            file_key and re.search(pat, file_key)
        ):
            return label
    return entry or file_key or "pallas (unknown)"


def classify(recs, xla_patterns=()):
    """Group xprof rows -> ({label: {ms, gbps}}, glue_ms, glue_rows).
    Pallas custom calls are matched BY KERNEL NAME via kernel_label();
    xla_patterns is a list of (label, name regex, category regex) for
    named non-Pallas groups (e.g. the XLA sorts of the speckle filter).
    Everything else is glue; the top glue rows are returned for
    attribution."""
    groups = {}
    glue_ms = 0.0
    glue_rows = []
    for rec in recs:
        ms = rec["total_self_us"] / 1e3
        label = kernel_label(rec)
        if label is None:
            name = str(rec["name"])
            cat = str(rec.get("category") or "")
            for gname, name_pat, cat_pat in xla_patterns:
                if re.match(name_pat, name) or re.match(cat_pat, cat):
                    label = gname
                    break
        if label is None:
            glue_ms += ms
            glue_rows.append(rec)
            continue
        g = groups.setdefault(label, {"ms": 0.0, "gbps": []})
        g["ms"] += ms
        if rec["hbm_gbps"]:
            g["gbps"].append(rec["hbm_gbps"])
    return groups, glue_ms, glue_rows


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

    # named non-Pallas groups: the speckle filter's XLA sorts
    sgbm_xla_patterns = [
        ("speckle area sorts", r"sort", r"sort"),
    ]

    from scripts.vpu_peak import vpu_peak_ops

    try:
        vpu_peak = vpu_peak_ops()
    except Exception as e:  # noqa: BLE001
        print(f"VPU peak unavailable ({e}); %VPU column will be blank")
        vpu_peak = None

    lines = []

    def emit(header, recs, byte_models, vop_models, frame_ms,
             xla_patterns=()):
        lines.append(f"\n### {header} (measured, v5e single chip)\n")
        lines.append(
            "| kernel | ms/frame | HBM GB | GB/s | % HBM | Gops | % VPU "
            "| bound |"
        )
        lines.append("|---|---|---|---|---|---|---|---|")
        groups, glue_ms, glue_rows = classify(recs, xla_patterns)
        for gname, g in sorted(groups.items(), key=lambda kv: -kv[1]["ms"]):
            ms = g["ms"]
            if gname in byte_models:
                gb = byte_models[gname] / 1e9
                gbps = gb / (ms / 1e3)
                hbm_s = f"{gb:.2f} | {gbps:.0f} | {100 * gbps / HBM_PEAK:.0f}%"
                hbm_frac = gbps / HBM_PEAK
            else:
                gbps = max(g["gbps"], default=0.0)
                hbm_s = f"— | {gbps:.0f} (xprof) | {100 * gbps / HBM_PEAK:.0f}%"
                hbm_frac = gbps / HBM_PEAK
            if gname in vop_models and vpu_peak:
                raw_ops, model_t = vop_models[gname]
                gops = raw_ops / 1e9
                vfrac = model_t / (ms / 1e3)
                vpu_s = f"{gops:.1f} | {100 * vfrac:.0f}%"
            else:
                vfrac = 0.0
                vpu_s = "— | —"
            bound = "HBM" if hbm_frac >= max(vfrac, 0.5) else (
                "VPU" if vfrac >= 0.5 else "neither (overheads)"
            )
            lines.append(f"| {gname} | {ms:.2f} | {hbm_s} | {vpu_s} | {bound} |")
        lines.append(
            f"| XLA glue (everything else) | {glue_ms:.2f} | | | | | | |"
        )
        lines.append(
            f"| **total device** | **{frame_ms:.2f}** | | | | | | |"
        )
        # stdout-only glue attribution (top rows) for lever hunting
        print(f"-- {header}: top glue ops ({glue_ms:.2f} ms total)")
        for r in sorted(glue_rows, key=lambda r: -r["total_self_us"])[:20]:
            print(
                f"   {str(r['name'])[:46]:46s} {str(r['category'])[:12]:12s}"
                f" {r['total_self_us'] / 1e3:7.2f} ms "
                f"{str(r.get('expression') or '')[:90]}"
            )

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
        emit(cname, recs, gif_kernel_bytes(Hc, Wc, Dc),
             gif_kernel_vops(Hc, Wc, Dc), frame_ms)
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
        emit(cname, recs, sgbm_kernel_bytes(Hc, Wc, Dc),
             sgbm_kernel_vops(Hc, Wc, Dc), frame_ms,
             xla_patterns=sgbm_xla_patterns)
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
