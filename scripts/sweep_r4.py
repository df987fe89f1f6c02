"""Round-4 on-TPU A/B sweep: WTA mask_d0 poison + WMF K-way probes at 2K.

Times isolated kernels (axon relay: enqueue N, fetch once). Run as a
background task; not part of the test suite.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

H, W, D, s = 1242, 2208, 256, 4
h, w = H // s, W // s
rng = np.random.default_rng(0)


def timeit(fn, n=8):
    out = fn()
    np.asarray(out)          # warm + sync
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


# ---------------- WTA: mask_d0 on/off --------------------------------------
from primestereomatch_tpu.kernels.lowmaps_pallas import fgf_low_maps_pallas
from primestereomatch_tpu.kernels.wta_pallas import (
    fgf_wta_pallas_maps, poly_col_params,
)

g = jnp.asarray(rng.random((H, W, 3), np.float32))
p = jnp.asarray(rng.random((D, h, w), np.float32))
pp = poly_col_params(w, W)

for poison in (False, True):
    maps = fgf_low_maps_pallas(
        g, p, 8, 1e-4, s, out_wp=pp["out_wp"], out_margin=pp["margin"],
        poison_d0=poison,
    )
    f = jax.jit(lambda gg, mm, poison=poison: fgf_wta_pallas_maps(
        gg, mm, (h, w), (H, W), d_chunk=32, poly=True,
        mask_d0=not poison,
    ))
    t = timeit(lambda: f(g, maps))
    print(f"WTA 2K/view poly mask_d0={not poison}: {t:.2f} ms", flush=True)

# ---------------- WMF: K-way probes ----------------------------------------
import primestereomatch_tpu.kernels.wmf_pallas as wmf

guide_u8 = jnp.asarray((rng.random((H, W, 3)) * 255).astype(np.uint8))
# realistic disparity field: smooth + quantized (tile ranges ~ tens of
# levels like real output), plus a uniform-random worst case
from scipy.ndimage import uniform_filter  # noqa: E402

smooth = uniform_filter(rng.random((H, W)) * 255, size=51)
disp_smooth = jnp.asarray(np.clip(smooth, 0, 255).astype(np.uint8))
disp_rand = jnp.asarray((rng.random((H, W)) * 256).astype(np.uint8))

for nway in (2, 4, 8):
    wmf._NWAY = nway
    fwmf = jax.jit(lambda d, g_, n=nway: wmf.joint_wmf_pallas(
        d, g_, radius=9, n_bins=256, sigma=25.5,
    ))
    ts = timeit(lambda: fwmf(disp_smooth, guide_u8))
    tr = timeit(lambda: fwmf(disp_rand, guide_u8))
    print(f"WMF 2K/view nway={nway}: smooth {ts:.2f} ms, rand {tr:.2f} ms",
          flush=True)
