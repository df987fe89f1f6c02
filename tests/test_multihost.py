"""Multi-process SPMD: the sharded pipeline across >= 2 coordinated
processes (jax.distributed + Gloo over localhost), each with virtual CPU
devices — the headless harness for pod-slice logic (SURVEY.md §5.8).

Each worker verifies its addressable output shards BITWISE against the
single-device pipeline (the check lives in launch.worker_main); a nonzero
exit fails the test. Spawned as subprocesses because a JAX process can
initialize the distributed runtime only once.
"""

import sys

import pytest

from primestereomatch_tpu.parallel.launch import spawn_local


needs_subproc = pytest.mark.skipif(
    sys.platform != "linux", reason="multi-process harness targets linux CI"
)


@needs_subproc
@pytest.mark.slow
def test_two_process_disparity_sharding():
    rc = spawn_local(
        processes=2, devices_per_process=2, port=8491,
        batch=2, height=64, width=96, max_dis=16, check=True,
    )
    assert rc == 0


@needs_subproc
@pytest.mark.slow
def test_two_process_row_sharding_halo_over_dcn():
    # y=2 spans the process boundary: the halo exchange ppermute crosses
    # processes; b=2 exercises data parallelism at the same time
    rc = spawn_local(
        processes=2, devices_per_process=2, port=8492,
        batch=2, height=64, width=96, max_dis=16, check=True,
        mesh_shape="2,2,1",
    )
    assert rc == 0
