"""Device-mesh construction for the sharded stereo pipeline.

The reference's parallelism axes (SURVEY.md §2 "Parallelism strategies"):
disparity-level (OpenMP over d, src/DispEst.cpp:209-294), row-level (OpenMP
over y, src/DispSel.cpp:88), and pixel-level NDRange — all within a single
memory domain. The TPU-native design promotes the first two axes to mesh
dimensions that span memory domains:

  b — frame batch (pure data parallelism; the throughput/video axis)
  y — image row tiles (halo exchange of the windowed-stage support radius
      rides ICI between neighbouring shards)
  d — disparity blocks (CVC/CVF compute their block locally; WTA merges
      with an all-gather argmin reduction — an associative min-reduction,
      so it composes exactly like a sharded softmax-max)

Columns (W) are deliberately left unsharded: they are the TPU lane
dimension, and the cost at disparity d reads pixels up to d columns away,
which would make the x-halo as wide as max_dis itself (SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh


AXIS_BATCH = "b"
AXIS_ROWS = "y"
AXIS_DISP = "d"


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    batch: int
    rows: int
    disp: int

    @property
    def n_devices(self) -> int:
        return self.batch * self.rows * self.disp


def factor_devices(n: int, max_disp_shards: int = 4) -> MeshPlan:
    """Factor an n-device slice into (b, y, d).

    Heuristic: give the disparity axis a small power-of-two share (its
    all-gather merge is the cheapest collective, but CVC work replicates
    image reads), rows the next share (halo cost is O(halo/tile)), and the
    remainder to batch.
    """
    if n < 1:
        raise ValueError(f"need >= 1 device, got {n}")
    d = 1
    while d * 2 <= max_disp_shards and n % (d * 2) == 0:
        d *= 2
    rem = n // d
    y = 1
    while y * 2 <= 4 and rem % (y * 2) == 0:
        y *= 2
    b = rem // y
    return MeshPlan(batch=b, rows=y, disp=d)


def make_mesh(
    plan: MeshPlan | None = None,
    devices: list | None = None,
) -> Mesh:
    """Build a (b, y, d) mesh over the given (default: all) devices."""
    devices = devices if devices is not None else jax.devices()
    if plan is None:
        plan = factor_devices(len(devices))
    if plan.n_devices != len(devices):
        raise ValueError(f"{plan} does not cover {len(devices)} devices")
    import numpy as np

    arr = np.asarray(devices).reshape(plan.batch, plan.rows, plan.disp)
    return Mesh(arr, (AXIS_BATCH, AXIS_ROWS, AXIS_DISP))
