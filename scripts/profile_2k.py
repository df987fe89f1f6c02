"""Stage + per-HLO breakdown of STEREO_GIF at 2K/d=256 on the real TPU.

Times each pipeline stage in isolation (axon relay: enqueue N, fetch once)
and dumps the measured per-HLO table of the full forward via
utils.profiling.collect_hlo_stats. Run as a background task (fresh 2K
Pallas compiles take minutes on the relay).

Usage: python scripts/profile_2k.py [teddy|hd720|2k]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from primestereomatch_tpu.config import GIFConfig
from primestereomatch_tpu.models.gif_pipeline import stereo_gif_forward, _to_u8
from primestereomatch_tpu.utils.datasets import load_dataset

SIZE = sys.argv[1] if len(sys.argv) > 1 else "2k"
H, W, D = {"teddy": (375, 450, 64), "hd720": (720, 1280, 128),
           "2k": (1242, 2208, 256)}[SIZE]
s = 4

teddy = load_dataset("Teddy")


def tiled(img, hw):
    Ht, Wt = hw
    reps = (Ht // img.shape[0] + 1, Wt // img.shape[1] + 1, 1)
    return np.tile(img, reps)[:Ht, :Wt]


l_img = jnp.asarray(tiled(teddy.left_f32, (H, W)))
r_img = jnp.asarray(tiled(teddy.right_f32, (H, W)))
cfg = GIFConfig(max_dis=D)


def timeit(fn, n=6):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].reshape(-1)[:1])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


# ---- stage isolation -------------------------------------------------------
from primestereomatch_tpu.ops.color import bgr_to_gray_refquirk, sobel_x_k1
from primestereomatch_tpu.ops.cost_volume import build_cost_volumes_sampled
from primestereomatch_tpu.ops.resize import nearest_indices
from primestereomatch_tpu.kernels.lowmaps_pallas import fgf_low_maps_pallas
from primestereomatch_tpu.kernels.wta_pallas import (
    fgf_wta_pallas_maps, poly_col_params,
)
from primestereomatch_tpu.kernels import joint_wmf_pallas

yi = nearest_indices(H, H // s)
xi = nearest_indices(W, W // s)
h, w = len(yi), len(xi)
pp = poly_col_params(w, W)
print(f"size={SIZE} H={H} W={W} D={D} h={h} w={w} poly={pp}", flush=True)


@jax.jit
def cvc(a, b):
    ag = sobel_x_k1(bgr_to_gray_refquirk(a))
    bg = sobel_x_k1(bgr_to_gray_refquirk(b))
    return build_cost_volumes_sampled(a, b, ag, bg, D, yi, xi)


lcv, rcv = cvc(l_img, r_img)
print(f"cvc(both views): {timeit(lambda: cvc(l_img, r_img)):.2f} ms", flush=True)

lowm = jax.jit(lambda g, p: fgf_low_maps_pallas(
    g, p, 8, 1e-4, s, out_wp=pp["out_wp"], out_margin=pp["margin"]))
maps = lowm(l_img, lcv)
# timing variant returns a tiny slice so the enqueued steps don't hold
# n live 1.17 GB map tensors (the relay chip OOMs otherwise)
lowm_t = jax.jit(lambda g, p: fgf_low_maps_pallas(
    g, p, 8, 1e-4, s, out_wp=pp["out_wp"], out_margin=pp["margin"])[..., :1, :1])
print(f"lowmaps(1 view): {timeit(lambda: lowm_t(l_img, lcv)):.2f} ms", flush=True)

wta = jax.jit(lambda g, m: fgf_wta_pallas_maps(
    g, m, (h, w), (H, W), d_chunk=32, poly=True))
disp = wta(l_img, maps)
print(f"wta(1 view): {timeit(lambda: wta(l_img, maps)):.2f} ms", flush=True)

wmf = jax.jit(lambda d, g: joint_wmf_pallas(
    d, _to_u8(g), radius=cfg.wmf_radius, n_bins=D, sigma=cfg.wmf_sigma))
_ = wmf(disp, l_img)
print(f"wmf(1 view): {timeit(lambda: wmf(disp, l_img)):.2f} ms", flush=True)

fwd = jax.jit(lambda a, b: stereo_gif_forward(a, b, cfg))
_ = fwd(l_img, r_img)
print(f"full forward: {timeit(lambda: fwd(l_img, r_img), n=4):.2f} ms", flush=True)

# ---- measured per-HLO table ------------------------------------------------
try:
    from primestereomatch_tpu.utils.profiling import collect_hlo_stats

    recs = collect_hlo_stats(fwd, (l_img, r_img), steps=4, warmup=1)
    tot = sum(r["total_self_us"] for r in recs)
    print(f"\nper-HLO (total {tot/1e3:.1f} ms over 4 steps):", flush=True)
    print(f"{'op':60s} {'cat':18s} {'ms/step':>8s} {'GB/s':>7s} "
          f"{'bound':>8s} {'stall%':>6s}")
    for r in recs[:40]:
        print(f"{str(r['name'])[:60]:60s} {str(r['category'])[:18]:18s} "
              f"{r['total_self_us']/4e3:8.2f} {r['hbm_gbps']:7.1f} "
              f"{str(r['bound_by'])[:8]:>8s} {r['dma_stall_pct']:6.1f}",
              flush=True)
except Exception as e:  # noqa: BLE001
    print(f"hlo stats failed: {type(e).__name__}: {e}", flush=True)
