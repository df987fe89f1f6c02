"""Multi-host (multi-process) SPMD launcher for the sharded pipeline.

The reference is strictly single-node (SURVEY.md §2: "no multi-process, no
multi-node, no collective ops of any kind"); scaling past one chip is new
TPU-native capability. This module provides the execution path SURVEY.md
§5.8 / §7-step-7 call for:

  * `initialize(...)` — `jax.distributed.initialize` wrapper: one process
    per host (TPU pods) or N processes on one machine (CPU testing). After
    it returns, `jax.devices()` is the GLOBAL device list and the same
    `make_mesh`/`make_sharded_gif` SPMD program runs unchanged — XLA routes
    `ppermute`/`all_gather` over ICI within a slice and DCN across hosts.
  * `worker_main(...)` — one SPMD worker: initialize, build the (b, y, d)
    mesh over all global devices, feed globally-sharded inputs
    (`jax.make_array_from_callback` — each process materializes only its
    addressable shards), run the jitted sharded step, and optionally verify
    its local output shards bitwise against the single-device pipeline.
  * CLI (`python -m primestereomatch_tpu.launch`):
      - `local --processes N`: spawn N coordinated worker subprocesses on
        this machine over virtual CPU devices (the headless CI harness for
        pod-slice logic — tests/test_multihost.py).
      - `worker --coordinator H:P --num-processes N --process-id I`: a
        single worker, one invocation per host on a real pod.

Real-pod usage (one process per host, e.g. v4-16 = 2 hosts):

    python -m primestereomatch_tpu.launch worker \
        --coordinator 10.0.0.1:8476 --num-processes 2 --process-id $WORKER_ID
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """`jax.distributed.initialize` with explicit args (TPU pods can omit
    all three — JAX discovers them from the TPU metadata)."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def worker_main(
    coordinator: str | None,
    num_processes: int | None,
    process_id: int | None,
    batch: int = 2,
    height: int = 64,
    width: int = 96,
    max_dis: int = 16,
    subsample: int = 4,
    check: bool = True,
    seed: int = 0,
    mesh_shape: str | None = None,   # "b,y,d" override, e.g. "1,2,2"
) -> int:
    """Run one SPMD worker of the sharded STEREO_GIF step; returns 0 on
    success (and, with --check, bitwise agreement of every local output
    shard with the single-device pipeline)."""
    initialize(coordinator, num_processes, process_id)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from primestereomatch_tpu.config import GIFConfig
    from primestereomatch_tpu.parallel.mesh import (
        AXIS_BATCH,
        AXIS_ROWS,
        factor_devices,
        make_mesh,
    )
    from primestereomatch_tpu.parallel.sharded import make_sharded_gif

    from primestereomatch_tpu.parallel.mesh import MeshPlan

    n = len(jax.devices())
    if mesh_shape:
        b, y, d = (int(t) for t in mesh_shape.split(","))
        plan = MeshPlan(batch=b, rows=y, disp=d)
    else:
        plan = factor_devices(n)
    mesh = make_mesh(plan)
    cfg = GIFConfig(max_dis=max_dis, subsample=subsample)
    step = make_sharded_gif(mesh, cfg)

    # identical deterministic inputs on every process; each materializes
    # only the shards it owns
    rng = np.random.default_rng(seed)
    l_np = rng.random((batch, height, width, 3), np.float32)
    r_np = rng.random((batch, height, width, 3), np.float32)
    in_sharding = NamedSharding(mesh, P(AXIS_BATCH, AXIS_ROWS, None, None))

    def gmake(a):
        return jax.make_array_from_callback(
            a.shape, in_sharding, lambda idx: jnp.asarray(a[idx])
        )

    l_disp, r_disp = step(gmake(l_np), gmake(r_np))
    jax.block_until_ready((l_disp, r_disp))

    rc = 0
    if check:
        from primestereomatch_tpu.models.gif_pipeline import stereo_gif_forward

        with jax.default_device(jax.local_devices()[0]):
            ref = [
                np.asarray(
                    jax.vmap(
                        lambda a, b: jnp.stack(stereo_gif_forward(a, b, cfg))
                    )(jnp.asarray(l_np), jnp.asarray(r_np))
                )
            ]
        ref_l, ref_r = ref[0][:, 0], ref[0][:, 1]
        for out, want in ((l_disp, ref_l), (r_disp, ref_r)):
            for shard in out.addressable_shards:
                got = np.asarray(shard.data)
                exp = want[shard.index]
                if not np.array_equal(got, exp):
                    bad = (got != exp).mean()
                    print(
                        f"[proc {jax.process_index()}] shard {shard.index} "
                        f"MISMATCH ({bad:.2%} px)",
                        file=sys.stderr,
                    )
                    rc = 1
    print(
        f"[proc {jax.process_index()}] ok: mesh {dict(mesh.shape)} over "
        f"{n} devices, out {l_disp.shape} "
        f"{'(verified bitwise)' if check and rc == 0 else ''}"
    )
    return rc


def spawn_local(
    processes: int,
    devices_per_process: int = 4,
    port: int = 8476,
    timeout: float = 600.0,
    **worker_kw,
) -> int:
    """Spawn `processes` coordinated CPU workers on this machine (the CI
    harness for multi-host logic — no TPUs needed)."""
    args = [
        sys.executable, "-m", "primestereomatch_tpu.parallel.launch", "worker",
        "--coordinator", f"localhost:{port}",
        "--num-processes", str(processes),
    ]
    for k, v in worker_kw.items():
        if v is None:
            continue
        if isinstance(v, bool):
            if not v:
                args += [f"--no-{k.replace('_', '-')}"]
        else:
            args += [f"--{k.replace('_', '-')}", str(v)]
    procs = []
    for i in range(processes):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={devices_per_process}"
        ).strip()
        # repo root only: a sitecustomize on the inherited PYTHONPATH (e.g.
        # a device-relay shim) would initialise the XLA backend at import,
        # which must not happen before jax.distributed.initialize()
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        procs.append(
            subprocess.Popen(args + ["--process-id", str(i)], env=env)
        )
    rc = 0
    for p in procs:
        try:
            rc |= p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    return rc


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="psm-tpu-launch",
        description="multi-process SPMD launcher for the sharded pipeline",
    )
    sub = ap.add_subparsers(dest="mode", required=True)

    def common(p):
        p.add_argument("--batch", type=int, default=2)
        p.add_argument("--height", type=int, default=64)
        p.add_argument("--width", type=int, default=96)
        p.add_argument("--max-dis", type=int, default=16)
        p.add_argument("--subsample", type=int, default=4)
        p.add_argument("--seed", type=int, default=0)
        p.add_argument(
            "--check", action=argparse.BooleanOptionalAction, default=True,
            help="verify local shards bitwise vs the single-device pipeline",
        )
        p.add_argument(
            "--mesh-shape", default=None,
            help="explicit 'b,y,d' mesh (default: factor_devices heuristic)",
        )

    w = sub.add_parser("worker", help="one SPMD worker (one per host)")
    w.add_argument("--coordinator", default=None, help="host:port (omit on TPU pods)")
    w.add_argument("--num-processes", type=int, default=None)
    w.add_argument("--process-id", type=int, default=None)
    common(w)

    l = sub.add_parser("local", help="spawn N coordinated CPU workers locally")
    l.add_argument("--processes", type=int, default=2)
    l.add_argument("--devices-per-process", type=int, default=4)
    l.add_argument("--port", type=int, default=8476)
    common(l)
    return ap


def main(argv: list[str] | None = None) -> int:
    ns = _build_parser().parse_args(argv)
    kw = dict(
        batch=ns.batch, height=ns.height, width=ns.width,
        max_dis=ns.max_dis, subsample=ns.subsample,
        check=ns.check, seed=ns.seed, mesh_shape=ns.mesh_shape,
    )
    if ns.mode == "worker":
        return worker_main(ns.coordinator, ns.num_processes, ns.process_id, **kw)
    return spawn_local(
        ns.processes, ns.devices_per_process, port=ns.port, **kw
    )


if __name__ == "__main__":
    sys.exit(main())
