"""One-off tuning sweep for the poly WTA kernel at 2K/d=256 (run on TPU).

Times lowmaps + WTA in isolation (axon relay: enqueue N, fetch once) over
tile_h / poly_twq / d_chunk. Statics close over a jit lambda (the maps
entry point is only jitted inside stereo_gif_forward). Not part of the
test suite.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from primestereomatch_tpu.kernels.lowmaps_pallas import fgf_low_maps_pallas
from primestereomatch_tpu.kernels.wta_pallas import (
    fgf_wta_pallas_maps, poly_col_params,
)

H, W, D, s = 1242, 2208, 256, 4
h, w = H // s, W // s
rng = np.random.default_rng(0)
g = jnp.asarray(rng.random((H, W, 3), np.float32))
p = jnp.asarray(rng.random((D, h, w), np.float32))


def timeit(fn, n=8):
    out = fn()
    np.asarray(out)          # warm + sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / n * 1e3


for twq in (None, 512, 768):
    pp = poly_col_params(w, W, twq=twq)

    def lowm(gg, pp_=pp):
        return fgf_low_maps_pallas(
            gg, p, 8, 1e-4, s, out_wp=pp_["out_wp"], out_margin=pp_["margin"]
        )

    maps = lowm(g)
    t_low = timeit(lambda: lowm(g))
    print(f"twq={twq} maps={maps.shape} lowmaps={t_low:.2f} ms", flush=True)
    for th in (32, 64, 128):
        for dc in (16, 32, 64):
            try:
                f = jax.jit(
                    lambda gg, mm, th=th, dc=dc, twq=twq: fgf_wta_pallas_maps(
                        gg, mm, (h, w), (H, W), d_chunk=dc, poly=True,
                        tile_h=th, poly_twq=twq,
                    )
                )
                t = timeit(lambda: f(g, maps))
                print(f"  th={th} twq={twq} dc={dc}: {t:.2f} ms", flush=True)
            except Exception as e:
                print(f"  th={th} twq={twq} dc={dc}: FAIL {str(e)[:90]}",
                      flush=True)
