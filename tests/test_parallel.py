"""Mesh-sharded pipeline vs the single-device golden path.

Runs on the 8-virtual-device CPU backend (tests/conftest.py). The sharded
STEREO_GIF step must reproduce the unsharded `stereo_gif_forward` exactly
on aligned shapes (H % (s*yn) == 0, W % s == 0) — the halo-exchange /
tile-FGF / WTA-merge construction is designed to commute with sharding
(parallel/sharded.py docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from primestereomatch_tpu.config import GIFConfig
from primestereomatch_tpu.models import stereo_gif_forward
from primestereomatch_tpu.parallel import MeshPlan, make_mesh, make_sharded_gif
from primestereomatch_tpu.parallel.sharded import halo_exchange_rows
from jax.sharding import PartitionSpec as P


CFG = GIFConfig(max_dis=16, med_sz=7)  # small D and WMF window: fast on CPU


def _rand_pair(rng, h, w):
    l = rng.random((h, w, 3), dtype=np.float32)
    # correlated right view: shifted left view + noise, so WTA is non-trivial
    r = np.roll(l, -3, axis=1) * 0.9 + 0.1 * rng.random((h, w, 3), dtype=np.float32)
    return l, r


def _reference(l, r, cfg):
    ld, rd = stereo_gif_forward(jnp.asarray(l), jnp.asarray(r), cfg)
    return np.asarray(ld), np.asarray(rd)


@pytest.mark.parametrize(
    "plan",
    [
        MeshPlan(1, 1, 1),
        MeshPlan(1, 4, 2),
        MeshPlan(2, 2, 2),
        MeshPlan(1, 2, 4),
        MeshPlan(8, 1, 1),
    ],
)
def test_sharded_matches_single_device(rng, plan):
    if plan.n_devices > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    h, w = 128, 96  # tile of 32 rows at yn=4 > halo 24 (s=4, r=8)
    l, r = _rand_pair(rng, h, w)
    ref_l, ref_r = _reference(l, r, CFG)

    mesh = make_mesh(plan, jax.devices()[: plan.n_devices])
    step = make_sharded_gif(mesh, CFG)
    B = plan.batch
    lb = jnp.broadcast_to(jnp.asarray(l), (B, h, w, 3))
    rb = jnp.broadcast_to(jnp.asarray(r), (B, h, w, 3))
    out_l, out_r = step(lb, rb)
    for i in range(B):
        np.testing.assert_array_equal(np.asarray(out_l[i]), ref_l)
        np.testing.assert_array_equal(np.asarray(out_r[i]), ref_r)


@pytest.mark.parametrize("plan", [MeshPlan(1, 1, 1), MeshPlan(4, 1, 1)])
def test_sharded_batch_only_unaligned_shape(rng, plan):
    """Batch-only meshes run the single-chip pipeline per shard, so they
    must accept shapes the row/disparity-tiled meshes reject (H=125 is not
    a multiple of s=4) and still match stereo_gif_forward exactly."""
    if plan.n_devices > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    h, w = 125, 96
    l, r = _rand_pair(rng, h, w)
    ref_l, ref_r = _reference(l, r, CFG)
    mesh = make_mesh(plan, jax.devices()[: plan.n_devices])
    step = make_sharded_gif(mesh, CFG)
    B = plan.batch
    lb = jnp.broadcast_to(jnp.asarray(l), (B, h, w, 3))
    rb = jnp.broadcast_to(jnp.asarray(r), (B, h, w, 3))
    out_l, out_r = step(lb, rb)
    for i in range(B):
        np.testing.assert_array_equal(np.asarray(out_l[i]), ref_l)
        np.testing.assert_array_equal(np.asarray(out_r[i]), ref_r)


def test_sharded_no_postprocess(rng):
    plan = MeshPlan(1, 2, 2)
    h, w = 64, 64
    l, r = _rand_pair(rng, h, w)
    ref_l, ref_r = stereo_gif_forward(
        jnp.asarray(l), jnp.asarray(r), CFG, run_postprocess=False
    )
    mesh = make_mesh(plan, jax.devices()[: plan.n_devices])
    step = make_sharded_gif(mesh, CFG, run_postprocess=False)
    out_l, out_r = step(jnp.asarray(l)[None], jnp.asarray(r)[None])
    np.testing.assert_array_equal(np.asarray(out_l[0]), np.asarray(ref_l))
    np.testing.assert_array_equal(np.asarray(out_r[0]), np.asarray(ref_r))


def test_halo_exchange_reflect_matches_pad(rng):
    """Gathering all shards' extended tiles must reproduce jnp.pad reflect
    of the full array at the global edges and true rows at the seams."""
    n, tile, w, halo = 4, 8, 5, 3
    x = rng.random((n * tile, w), dtype=np.float32)
    mesh = make_mesh(MeshPlan(1, n, 1), jax.devices()[:n])

    def fn(blk):
        return halo_exchange_rows(blk, halo, n, "y", row_axis=0, edge="reflect")

    ext = jax.shard_map(
        fn, mesh=mesh, in_specs=P("y", None),
        out_specs=P("y", None), check_vma=False,
    )(jnp.asarray(x))
    ext = np.asarray(ext).reshape(n, tile + 2 * halo, w)
    padded = np.pad(x, ((halo, halo), (0, 0)), mode="reflect")
    for i in range(n):
        np.testing.assert_array_equal(ext[i], padded[i * tile : i * tile + tile + 2 * halo])


def test_halo_exchange_zero_edges(rng):
    n, tile, w, halo = 2, 6, 4, 2
    x = rng.random((n * tile, w), dtype=np.float32)
    mesh = make_mesh(MeshPlan(1, n, 1), jax.devices()[:n])

    def fn(blk):
        return halo_exchange_rows(blk, halo, n, "y", row_axis=0, edge="zero")

    ext = np.asarray(
        jax.shard_map(
            fn, mesh=mesh, in_specs=P("y", None),
            out_specs=P("y", None), check_vma=False,
        )(jnp.asarray(x))
    ).reshape(n, tile + 2 * halo, w)
    np.testing.assert_array_equal(ext[0, :halo], 0.0)           # global top
    np.testing.assert_array_equal(ext[-1, -halo:], 0.0)          # global bottom
    np.testing.assert_array_equal(ext[0, -halo:], x[tile : tile + halo])
    np.testing.assert_array_equal(ext[1, :halo], x[tile - halo : tile])


def test_sharded_sgbm_batch_parallel(rng):
    from primestereomatch_tpu.config import SGBMConfig
    from primestereomatch_tpu.models.sgbm_pipeline import stereo_sgbm_forward
    from primestereomatch_tpu.parallel.sharded import make_sharded_sgbm

    plan = MeshPlan(4, 1, 1)
    mesh = make_mesh(plan, jax.devices()[:4])
    cfg = SGBMConfig(num_disparities=8, speckle_window_size=10)
    step = make_sharded_sgbm(mesh, cfg)

    B, H, W = 4, 24, 48
    l = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
    r = np.roll(l, -2, axis=2)
    out = np.asarray(step(jnp.asarray(l), jnp.asarray(r)))
    assert out.shape == (B, H, W) and out.dtype == np.int16
    for b in range(B):
        ref = np.asarray(stereo_sgbm_forward(
            jnp.asarray(l[b]), jnp.asarray(r[b]), cfg
        ))
        np.testing.assert_array_equal(out[b], ref)
