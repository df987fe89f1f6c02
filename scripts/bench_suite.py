"""Benchmark suite over the BASELINE.json config axes (single chip).

Configs: Middlebury 450x375/d64 (GIF + SGBM), HD720 1280x720/d128,
2K 2208x1242/d256, and batched throughput. Prints one JSON line per
config and writes BENCH_SUITE.json. bench.py remains the driver's
single-line headline metric.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402  (module-level: _force is used by importers too)


def _force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def _make_2k_stream_app(StereoMatchApp, AppConfig, SyntheticZEDSource):
    # video mode with a 2K synthetic source (no bundled 2K dataset); the
    # source is replaced post-construction because AppConfig's video_source
    # spec string carries no size parameters
    app = StereoMatchApp(AppConfig(
        media_mode="video", video_source="synthetic", max_dis=256))
    app._source = SyntheticZEDSource(
        width=2208, height=1242, n_frames=10_000, max_disparity=256)
    return app


def bench(fn, args, iters=10, warmup=2):
    # enqueue-depth note: the axon relay adds a fixed ~26 ms latency to
    # the final host fetch (bench.py's depth sweep), so per-frame numbers
    # carry a +26/iters ms bias — the iters below keep it under ~5%
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _force(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    global jax
    import jax
    import jax.numpy as jnp

    from primestereomatch_tpu.config import GIFConfig, SGBMConfig
    from primestereomatch_tpu.models.gif_pipeline import stereo_gif_forward
    from primestereomatch_tpu.models.sgbm_pipeline import stereo_sgbm_forward
    from primestereomatch_tpu.utils.datasets import load_dataset

    results = []

    def record(name, seconds, unit="frames/sec/chip", scale=1.0, iters=None,
               note=None):
        # iters is recorded so the relay-fetch amortization (+C/iters ms
        # per frame, C ~ 26-60 ms — bench.py's depth-sweep decomposition)
        # can be compared across rows and against the driver headline
        fps = scale / seconds
        row = {"config": name, "value": round(fps, 3), "unit": unit,
               "ms_per_frame": round(seconds * 1e3 / scale, 3)}
        if iters is not None:
            row["iters"] = iters
        if note is not None:
            row["note"] = note
        results.append(row)
        print(json.dumps(row))

    teddy = load_dataset("Teddy")
    l64 = jnp.asarray(teddy.left_f32)
    r64 = jnp.asarray(teddy.right_f32)

    def tiled(img, hw):
        # real-content large inputs: tile the Middlebury pair up to the
        # target extent. Random noise is a pathological workload (it
        # maximizes speckle-CC fragmentation and defeats every natural-
        # image assumption); the reference only ever sees camera/dataset
        # frames, so the large-size rows bench the same content class.
        H, W = hw
        reps = (H // img.shape[0] + 1, W // img.shape[1] + 1, 1)
        return np.tile(img, reps)[:H, :W]

    # 1. golden: Teddy GIF d=64
    cfg = GIFConfig()
    f = jax.jit(lambda a, b: stereo_gif_forward(a, b, cfg))
    record("gif_teddy_450x375_d64", bench(f, (l64, r64), iters=40), iters=40)

    # 2. Teddy SGBM d=64
    lu = jnp.asarray(teddy.left_bgr)
    ru = jnp.asarray(teddy.right_bgr)
    fs = jax.jit(lambda a, b: stereo_sgbm_forward(a, b, SGBMConfig()))
    record("sgbm_teddy_450x375_d64", bench(fs, (lu, ru), iters=40), iters=40)

    # 3. HD720 GIF d=128
    try:
        lh = jnp.asarray(tiled(teddy.left_f32, (720, 1280)))
        rh = jnp.asarray(tiled(teddy.right_f32, (720, 1280)))
        cfg128 = GIFConfig(max_dis=128)
        fh = jax.jit(lambda a, b: stereo_gif_forward(a, b, cfg128))
        record("gif_hd720_1280x720_d128", bench(fh, (lh, rh), iters=16), iters=16)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"config": "gif_hd720_1280x720_d128", "error": str(e)[:200]}))

    # 4. 2K GIF d=256 (BASELINE 30fps target is for a v4-16 slice; this is
    #    the single-chip number)
    try:
        l2k = jnp.asarray(tiled(teddy.left_f32, (1242, 2208)))
        r2k = jnp.asarray(tiled(teddy.right_f32, (1242, 2208)))
        cfg256 = GIFConfig(max_dis=256)
        f2k = jax.jit(lambda a, b: stereo_gif_forward(a, b, cfg256))
        record("gif_2k_2208x1242_d256", bench(f2k, (l2k, r2k), iters=12), iters=12)
        # opt-in FULLY fused CVC+maps+WTA tail (kernels/cvc_wta_pallas.py):
        # cost volume AND coefficient maps never exist in HBM
        cfg_fused = GIFConfig(max_dis=256, tail_fusion="full")
        f2kf = jax.jit(lambda a, b: stereo_gif_forward(a, b, cfg_fused))
        record("gif_2k_fused_tail", bench(f2kf, (l2k, r2k), iters=12), iters=12,
               note="opt-in tail_fusion='full' comparison row: one kernel "
                    "per view builds cost+maps+WTA in VMEM (~150 MB/frame "
                    "HBM vs ~10 GB) but is compute-bound above the default "
                    "maps path — expected slower; tracks the fused kernel "
                    "on hardware")
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"config": "gif_2k_2208x1242_d256", "error": str(e)[:200]}))

    # 5. batched throughput: 8 Teddy frames per dispatch — the batch-aware
    #    forward (CVC folded into rows) vs naive vmap (gathers get batch dims)
    try:
        from primestereomatch_tpu.models.gif_pipeline import stereo_gif_forward_batch

        B = 8
        lb = jnp.broadcast_to(l64, (B, *l64.shape))
        rb = jnp.broadcast_to(r64, (B, *r64.shape))
        fb = jax.jit(lambda a, b: stereo_gif_forward_batch(a, b, cfg))
        record("gif_teddy_batch8", bench(fb, (lb, rb), iters=10), scale=B, iters=10)
        # naive vmap with the DEFAULT (Pallas) impls: the maps/cvc entries
        # carry custom_vmap rules (batch-folded WTA, per-frame CVC maps),
        # so this measures what a user gets from plain jax.vmap
        fv = jax.jit(jax.vmap(lambda a, b: stereo_gif_forward(a, b, cfg)))
        record("gif_teddy_batch8_vmap", bench(fv, (lb, rb), iters=10), scale=B, iters=10)
        # the all-XLA-impl vmap row kept for continuity with r2/r3 numbers
        cfg_x = GIFConfig(wta_impl="xla", wmf_impl="jnp")
        fvx = jax.jit(jax.vmap(lambda a, b: stereo_gif_forward(a, b, cfg_x)))
        record("gif_teddy_batch8_vmap_xla", bench(fvx, (lb, rb), iters=5), scale=B,
               iters=5,
               note="XLA fallback under plain jax.vmap — deliberate comparison row (kernel custom_vmap rules give the batch8/vmap rows above); the ~30x spread vs gif_teddy_batch8 is expected, not a regression")
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"config": "gif_teddy_batch8", "error": str(e)[:200]}))

    # 6. SGBM at HD720/d=128 and 2K/d=256 (BASELINE size axes for the
    #    second algorithm; Teddy-only SGBM hid the large-size behavior)
    for name, hw, nd, it in (
        ("sgbm_hd720_1280x720_d128", (720, 1280), 128, 12),
        ("sgbm_2k_2208x1242_d256", (1242, 2208), 256, 8),
    ):
        try:
            lu8 = jnp.asarray(tiled(teddy.left_bgr, hw))
            ru8 = jnp.asarray(tiled(teddy.right_bgr, hw))
            scfg = SGBMConfig(num_disparities=nd)
            fsg = jax.jit(lambda a, b, c=scfg: stereo_sgbm_forward(a, b, c))
            record(name, bench(fsg, (lu8, ru8), iters=it), iters=it)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"config": name, "error": str(e)[:200]}))

    # 7. sharded step on the real chip at mesh (1,1,1): sharding overhead
    #    must be a measured number, not a design argument. ITERS MATCH the
    #    corresponding unsharded rows: round 4 benched this row at half
    #    the unsharded enqueue depth and the relay's fixed per-batch fetch
    #    latency C read as a fake 17% "sharding overhead" (C*(1/20-1/40)
    #    ~ 0.85 ms/frame at Teddy); a same-depth round-5 A/B/C/D measured
    #    unsharded vs batch-indexed vs mesh111 vs bare shard_map all
    #    within 0.6% (4.19-4.21 ms/frame)
    try:
        from primestereomatch_tpu.parallel import MeshPlan, make_mesh, make_sharded_gif

        mesh = make_mesh(MeshPlan(1, 1, 1), jax.devices()[:1])
        # batch-only mesh accepts any H/W: full frames, directly
        # comparable to the unsharded rows above
        for name, (lx, rx), c, it in (
            ("gif_teddy_sharded_mesh111", (l64, r64), cfg, 40),
            ("gif_2k_sharded_mesh111", (l2k, r2k), cfg256, 12),
        ):
            step = make_sharded_gif(mesh, c)
            record(name, bench(step, (lx[None], rx[None]), iters=it), iters=it)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"config": "gif_sharded_mesh111", "error": str(e)[:200]}))

    # 8. sharded SGBM (batch-DP dispatch) at mesh (1,1,1): the DP shard_map
    #    overhead on hardware — previously only CPU-mesh tested + dryrun
    try:
        from primestereomatch_tpu.parallel import MeshPlan, make_mesh, make_sharded_sgbm

        mesh = make_mesh(MeshPlan(1, 1, 1), jax.devices()[:1])
        l2u = jnp.asarray(tiled(teddy.left_bgr, (1242, 2208)))
        r2u = jnp.asarray(tiled(teddy.right_bgr, (1242, 2208)))
        for name, (lx, rx), nd, it in (
            ("sgbm_teddy_sharded_mesh111", (lu, ru), 64, 40),
            ("sgbm_2k_sharded_mesh111", (l2u, r2u), 256, 8),
        ):
            step = make_sharded_sgbm(mesh, SGBMConfig(num_disparities=nd))
            record(name, bench(step, (lx[None], rx[None]), iters=it), iters=it)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"config": "sgbm_sharded_mesh111", "error": str(e)[:200]}))

    # 9. streaming (`StereoMatchApp.stream` / CLI --pipeline): pipelined
    #    async dispatch with FULL per-frame host fetches — unlike the
    #    enqueue-N rows above, every frame pays the relay's fixed
    #    device-to-host fetch latency (overlapped with the next frame's
    #    compute), so this row measures end-to-end serving latency, not
    #    device throughput
    try:
        from primestereomatch_tpu.app import AppConfig, StereoMatchApp
        from primestereomatch_tpu.utils.video import SyntheticZEDSource

        for name, mk, frames in (
            ("gif_teddy_stream", lambda: StereoMatchApp(AppConfig(
                media_mode="image", dataset="Teddy")), 40),
            ("gif_2k_stream", lambda: _make_2k_stream_app(
                StereoMatchApp, AppConfig, SyntheticZEDSource), 12),
        ):
            app = mk()
            for _ in app.stream(4):    # warmup (compile + relay cold start)
                pass
            t0 = time.perf_counter()
            n = sum(1 for _ in app.stream(frames))
            dt = (time.perf_counter() - t0) / max(n, 1)
            record(name, dt, iters=frames,
                   note="pipelined stream(): per-frame host->device frame "
                        "upload AND full disparity fetch ride the relay "
                        "(fixed ~26-60 ms fetch latency overlapped but not "
                        "amortized; the 2K synthetic source uploads ~66 MB "
                        "of fresh frames per step) — an end-to-end serving "
                        "latency row, not device throughput")
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"config": "gif_stream", "error": str(e)[:200]}))

    with open("BENCH_SUITE.json", "w") as fjson:
        json.dump(results, fjson, indent=1)


if __name__ == "__main__":
    if "--profile" in sys.argv:
        # measured per-kernel roofline table (updates SCALING.md)
        from kernel_roofline import run as profile_run

        profile_run(update_scaling_md=True)
    else:
        main()
