"""Stage + per-HLO breakdown of STEREO_SGBM on the real TPU.

Times each pipeline stage in isolation (axon relay: enqueue N, fetch
once) and dumps the measured per-HLO table of the full forward via
utils.profiling.collect_hlo_stats. Run as a background task.

Usage: python scripts/profile_sgbm.py [teddy|hd720|2k]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from primestereomatch_tpu.config import SGBMConfig
from primestereomatch_tpu.models.sgbm_pipeline import stereo_sgbm_forward
from primestereomatch_tpu.ops.sgbm import (
    DISP_SCALE,
    clipped_xderiv,
    filter_speckles,
    select_disparity_hdw,
)
from primestereomatch_tpu.utils.datasets import load_dataset

SIZE = sys.argv[1] if len(sys.argv) > 1 else "2k"
H, W, D = {"teddy": (375, 450, 64), "hd720": (720, 1280, 128),
           "2k": (1242, 2208, 256)}[SIZE]
cfg = SGBMConfig(num_disparities=D)
teddy = load_dataset("Teddy")


def tiled(img, hw):
    Ht, Wt = hw
    reps = (Ht // img.shape[0] + 1, Wt // img.shape[1] + 1, 1)
    return np.tile(img, reps)[:Ht, :Wt]


l_u8 = jnp.asarray(tiled(teddy.left_bgr, (H, W)))
r_u8 = jnp.asarray(tiled(teddy.right_bgr, (H, W)))


def timeit(fn, n=5):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].reshape(-1)[:1])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


from primestereomatch_tpu.kernels.sgbm_pallas import (
    bt_block_cost_pallas,
    sgbm_aggregate_pallas,
)

ch = l_u8.shape[-1]
cost_bound = cfg.block_size ** 2 * ch * 2 * cfg.pre_filter_cap

ftr = jax.jit(lambda a: clipped_xderiv(a, cfg.pre_filter_cap))
l_ftr = ftr(l_u8)
r_ftr = ftr(r_u8)
print(f"size={SIZE} H={H} W={W} D={D} mode={cfg.mode}", flush=True)
print(f"xderiv(1 view): {timeit(lambda: ftr(l_u8)):.2f} ms", flush=True)

costk = jax.jit(lambda a, b: bt_block_cost_pallas(
    a, b, D, cfg.block_size, cost_bound=cost_bound))
C = costk(l_ftr, r_ftr)
costk_t = jax.jit(lambda a, b: bt_block_cost_pallas(
    a, b, D, cfg.block_size, cost_bound=cost_bound)[..., :1, :1])
print(f"bt_cost kernel: {timeit(lambda: costk_t(l_ftr, r_ftr)):.2f} ms",
      flush=True)

from primestereomatch_tpu.kernels.select_pallas import (
    select_disparity_partials_pallas,
)
from primestereomatch_tpu.kernels.sgbm_pallas import (
    sgbm_aggregate_partials_pallas,
)

aggp = jax.jit(lambda c: sgbm_aggregate_partials_pallas(
    c, cfg.p1, cfg.p2, cfg.num_directions, cost_bound=cost_bound,
    in_layout="dhw", logical_hw=(H, W)))
parts = aggp(C)
aggp_t = jax.jit(lambda c: [q[..., :1, :1] for q in sgbm_aggregate_partials_pallas(
    c, cfg.p1, cfg.p2, cfg.num_directions, cost_bound=cost_bound,
    in_layout="dhw", logical_hw=(H, W))])
print(f"aggregate partials ({cfg.num_directions} dirs): "
      f"{timeit(lambda: aggp_t(C)):.2f} ms", flush=True)

selp = jax.jit(lambda ps: select_disparity_partials_pallas(
    tuple(ps), (H, W), cfg.uniqueness_ratio, cfg.disp12_max_diff,
    cfg.min_disparity,
    value_bound=cfg.num_directions * (cost_bound + cfg.p2)))
d16 = selp(parts)
print(f"select kernel (from partials): {timeit(lambda: selp(parts)):.2f} ms",
      flush=True)

S = jax.jit(lambda ps: sum(
    q[:H, :, :W].astype(jnp.int32) for q in ps))(parts)
sel = jax.jit(lambda s_: select_disparity_hdw(
    s_, cfg.uniqueness_ratio, cfg.disp12_max_diff, cfg.min_disparity))
_ = sel(S)
print(f"select_disparity_hdw (XLA, from S): {timeit(lambda: sel(S)):.2f} ms",
      flush=True)

spk = jax.jit(lambda d: filter_speckles(
    d, cfg.speckle_window_size, DISP_SCALE * cfg.speckle_range,
    (cfg.min_disparity - 1) * DISP_SCALE))
_ = spk(d16)
print(f"filter_speckles: {timeit(lambda: spk(d16)):.2f} ms", flush=True)

fwd = jax.jit(lambda a, b: stereo_sgbm_forward(a, b, cfg))
_ = fwd(l_u8, r_u8)
print(f"full forward: {timeit(lambda: fwd(l_u8, r_u8), n=4):.2f} ms",
      flush=True)

try:
    from primestereomatch_tpu.utils.profiling import collect_hlo_stats

    recs = collect_hlo_stats(fwd, (l_u8, r_u8), steps=4, warmup=1)
    tot = sum(r["total_self_us"] for r in recs)
    print(f"\nper-HLO (total {tot/4e3:.1f} ms/step):", flush=True)
    for r in recs[:25]:
        print(f"{str(r['name'])[:58]:58s} {str(r['category'])[:14]:14s} "
              f"{r['total_self_us']/4e3:8.2f} ms {r['hbm_gbps']:7.1f} GB/s",
              flush=True)
except Exception as e:  # noqa: BLE001
    print(f"hlo stats failed: {type(e).__name__}: {e}", flush=True)
