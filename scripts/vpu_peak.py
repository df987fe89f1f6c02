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


def _kernel(x_ref, o_ref):
    import jax.numpy as jnp

    x = x_ref[...]
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)
    accs = [x + jnp.float32(i) for i in range(NACC)]
    for _ in range(INNER):
        accs = [acc * a + b for acc in accs]
    out = accs[0]
    for acc in accs[1:]:
        out = out + acc
    o_ref[...] = out


def measure() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    @jax.jit
    def run(x):
        return pl.pallas_call(
            _kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((TH, TW), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((TH, TW), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((TH, TW), jnp.float32),
        )(x)

    x = jnp.ones((TH, TW), jnp.float32)
    np.asarray(run(x))                      # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [run(x) for _ in range(8)]
        np.asarray(outs[-1])                # axon relay: host fetch syncs
        best = min(best, (time.perf_counter() - t0) / 8)
    ops = 2.0 * TH * TW * INNER * NACC * GRID   # mul+add per element
    dev = jax.devices()[0]
    return {
        "vpu_f32_ops_per_s": ops / best,
        "measured_s": best,
        "device": str(dev),
        "tile": [TH, TW],
        "inner": INNER,
        "grid": GRID,
    }


@functools.cache
def vpu_peak_ops() -> float:
    """Measured f32 VPU ops/s (cached in VPU_PEAK.json)."""
    if CACHE.exists():
        return json.loads(CACHE.read_text())["vpu_f32_ops_per_s"]
    res = measure()
    CACHE.write_text(json.dumps(res, indent=1))
    return res["vpu_f32_ops_per_s"]


if __name__ == "__main__":
    res = measure()
    CACHE.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))
