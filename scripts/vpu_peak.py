"""Measure the v5e VPU elementwise-f32 peak with a Pallas micro-kernel.

The roofline tables (scripts/kernel_roofline.py) label kernels far below
the HBM roofline as "VPU"-bound; this script turns that label into a
number by measuring the achievable vector ops/s: a chain of dependent
f32 multiply-adds on a VMEM-resident (256, 512) tile, unrolled so loop
overhead is negligible. Each fused a*x+b counts as 2 ops (mul + add) —
the same accounting the kernel op models use.

Result is cached in VPU_PEAK.json at the repo root (measured once per
hardware) and read by kernel_roofline.py for its "% VPU peak" column.
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ROOT = pathlib.Path(__file__).resolve().parents[1]
CACHE = ROOT / "VPU_PEAK.json"

TH, TW = 8, 512
NACC = 16            # independent chains (ILP so FMA latency hides);
                     # measured sweep on v5e: 8 acc 2.49, 12 acc 2.57,
                     # 16 acc 2.77, 24 acc 2.49 Tops/s
INNER = 96           # FMAs per chain per grid step
GRID = 2048


def _mix_kernels():
    """Op-mix micro-kernel bodies: name -> (step_fn, counted ops/step).

    Round-4's single FMA mix left the WMF/aggregation rows reading >100%
    of 'peak' — a kernel cannot exceed peak, so either the op models
    overcount or the peak is mix-dependent. These mixes measure the
    primitives the hot kernels actually issue: the WMF weight pass is
    exp-heavy (modeled at ~8 ops round-4 — the TPU transcendental unit
    does much better), its probe pass and the SGBM scans are
    compare/select/min chains, and the scans run int arithmetic."""
    import jax.numpy as jnp

    def fma(acc):
        return acc * jnp.float32(1.0000001) + jnp.float32(1e-7)

    def cmpsel(acc):
        # compare + select + mul: the WMF probe / argmin-fold shape
        return jnp.where(acc > jnp.float32(0.5),
                         acc * jnp.float32(0.9999), acc)

    def expmul(acc):
        # one exp + one mul per step; exp cost is derived by subtracting
        # the known mul cost post-hoc
        return jnp.exp(acc * jnp.float32(-0.001))

    def int_minadd(acc):
        # int32 add + min chain (the aggregation scans' arithmetic)
        return jnp.minimum(acc + jnp.int32(3), acc * jnp.int32(1) + jnp.int32(7))

    def add(acc):
        return acc + jnp.float32(1e-7)

    def wmf_weight(acc):
        # the WMF pass-1 weight step verbatim: 3 color diffs, squared
        # distance, exp, weighted accumulate (11 simple ops + 1 exp)
        d = acc - jnp.float32(0.3)
        e = acc - jnp.float32(0.5)
        f = acc - jnp.float32(0.7)
        s = d * d + e * e + f * f
        return jnp.exp(s * jnp.float32(-0.001)) + acc * jnp.float32(0.5)

    return {
        "fma": (fma, 2.0, "f32"),
        "add": (add, 1.0, "f32"),
        "cmpsel": (cmpsel, 3.0, "f32"),     # cmp + sel + mul
        "expmul": (expmul, 2.0, "f32"),     # exp(1) + mul(1), nominal
        "wmf_weight": (wmf_weight, 12.0, "f32"),
        "int_minadd": (int_minadd, 4.0, "i32"),  # add+min+mul+add
    }


def _make_kernel(step_fn):
    def _kernel(x_ref, o_ref):
        x = x_ref[...]
        accs = [x + i for i in range(NACC)]
        for _ in range(INNER):
            accs = [step_fn(acc) for acc in accs]
        out = accs[0]
        for acc in accs[1:]:
            out = out + acc
        o_ref[...] = out

    return _kernel


def measure() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    def bench_mix(step_fn, dt):
        @jax.jit
        def run(x):
            return pl.pallas_call(
                _make_kernel(step_fn),
                grid=(GRID,),
                in_specs=[pl.BlockSpec((TH, TW), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((TH, TW), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((TH, TW), dt),
            )(x)

        x = jnp.ones((TH, TW), dt)
        np.asarray(run(x))                  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            outs = [run(x) for _ in range(8)]
            np.asarray(outs[-1])            # axon relay: host fetch syncs
            best = min(best, (time.perf_counter() - t0) / 8)
        return best

    res = {"device": str(jax.devices()[0]), "tile": [TH, TW],
           "inner": INNER, "grid": GRID, "mixes": {}}
    steps = float(TH * TW * INNER * NACC * GRID)
    for name, (step_fn, ops_per_step, kind) in _mix_kernels().items():
        dt = jnp.float32 if kind == "f32" else jnp.int32
        t = bench_mix(step_fn, dt)
        res["mixes"][name] = {
            "measured_s": t,
            "ops_per_step": ops_per_step,
            "steps_per_s": steps / t,
            "ops_per_s": ops_per_step * steps / t,
        }
    # back-compat headline: the FMA-counted peak (2 ops per mul+add)
    res["vpu_f32_ops_per_s"] = res["mixes"]["fma"]["ops_per_s"]
    res["measured_s"] = res["mixes"]["fma"]["measured_s"]
    # derived per-primitive costs in FMA-op units (1 unit = 1/peak s):
    # exp = steps/s deficit of the expmul chain after removing the mul
    fma_rate = res["mixes"]["fma"]["steps_per_s"]          # 2 ops/step
    unit = 1.0 / (2.0 * fma_rate)                          # s per fma-op
    exp_steps = res["mixes"]["expmul"]["steps_per_s"]
    res["derived"] = {
        "fma_op_unit_s": unit,
        # (1/exp_rate - 1 mul) in fma-op units
        "exp_cost_ops": max((1.0 / exp_steps - unit) / unit, 1.0),
        "cmpsel_step_cost_ops": (1.0 / res["mixes"]["cmpsel"]["steps_per_s"]) / unit,
        "int_minadd_step_cost_ops": (1.0 / res["mixes"]["int_minadd"]["steps_per_s"]) / unit,
    }
    return res


@functools.cache
def vpu_peak_ops() -> float:
    """Measured f32 FMA-counted VPU ops/s (cached in VPU_PEAK.json)."""
    return mix_data()["vpu_f32_ops_per_s"]


@functools.cache
def mix_data() -> dict:
    """Full op-mix measurement (cached; re-measures if the cache predates
    the round-5 mix suite)."""
    if CACHE.exists():
        d = json.loads(CACHE.read_text())
        if "mixes" in d and "wmf_weight" in d["mixes"]:
            return d
    res = measure()
    CACHE.write_text(json.dumps(res, indent=1))
    return res


if __name__ == "__main__":
    res = measure()
    CACHE.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))
