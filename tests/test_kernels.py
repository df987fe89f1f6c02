"""Pallas kernels validated against the jnp ops in interpreter mode
(compiled-TPU agreement is additionally checked ad hoc on hardware; the
weight math is identical, only last-ulp cumulative-sum ties may differ)."""

import numpy as np
import jax.numpy as jnp
import pytest

from primestereomatch_tpu.kernels import joint_wmf_pallas
from primestereomatch_tpu.ops.jointwmf import joint_wmf


@pytest.mark.parametrize("radius,n_bins", [(5, 16), (9, 64), (3, 10)])
def test_wmf_pallas_matches_jnp(rng, radius, n_bins):
    H, W = 24, 40
    disp = jnp.asarray(rng.integers(0, n_bins, (H, W), dtype=np.uint8))
    guide = jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    ref = np.asarray(joint_wmf(disp, guide, radius=radius, n_bins=n_bins, sigma=25.5))
    got = np.asarray(joint_wmf_pallas(
        disp, guide, radius=radius, n_bins=n_bins, sigma=25.5, interpret=True
    ))
    mismatch = (ref != got).mean()
    assert mismatch <= 1e-3, f"{mismatch:.2%} pixels differ"
    assert np.abs(ref.astype(int) - got.astype(int)).max() <= 1


def test_wmf_pallas_valid_mask(rng):
    """valid=0 pixels contribute nothing; out-of-image padding stays out."""
    H, W = 16, 24
    disp = jnp.asarray(rng.integers(0, 16, (H, W), dtype=np.uint8))
    guide = jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    valid = jnp.asarray((rng.random((H, W)) > 0.3).astype(np.float32))
    ref = np.asarray(joint_wmf(disp, guide, radius=4, n_bins=16, valid=valid))
    got = np.asarray(joint_wmf_pallas(
        disp, guide, radius=4, n_bins=16, valid=valid, interpret=True
    ))
    assert (ref != got).mean() <= 1e-3


def test_wmf_pallas_smooth_region_identity():
    """On a constant image with constant disparity the median is trivially
    that disparity everywhere — exact, no ties."""
    H, W = 16, 130  # crosses a lane-tile boundary
    disp = jnp.full((H, W), 7, jnp.uint8)
    guide = jnp.full((H, W, 3), 128, jnp.uint8)
    got = np.asarray(joint_wmf_pallas(disp, guide, radius=9, n_bins=64, interpret=True))
    np.testing.assert_array_equal(got, 7)


def test_wmf_pallas_vmap(rng):
    """jax.vmap over the kernel lowers to one batched pallas_call."""
    import jax

    B, H, W = 3, 16, 24
    disp = jnp.asarray(rng.integers(0, 16, (B, H, W), dtype=np.uint8))
    guide = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
    f = jax.vmap(lambda d, g: joint_wmf_pallas(
        d, g, radius=4, n_bins=16, interpret=True
    ))
    got = np.asarray(f(disp, guide))
    for b in range(B):
        ref = np.asarray(joint_wmf(disp[b], guide[b], radius=4, n_bins=16))
        assert (got[b] != ref).mean() <= 1e-3


def test_fgf_wta_pallas_matches_reference(rng):
    """Fused upsample+WTA kernel == chunked XLA reference (lerp), exact."""
    from primestereomatch_tpu.kernels.wta_pallas import fgf_wta_pallas
    from primestereomatch_tpu.ops.guided_filter import fgf_low_maps, fgf_wta_low_maps

    H, W, D = 48, 200, 16
    guide = jnp.asarray(rng.random((H, W, 3), dtype=np.float32))
    p_low = jnp.asarray(rng.random((D, H // 4, W // 4), dtype=np.float32))
    ma, mb = fgf_low_maps(guide, p_low, 8, 1e-4, 4)
    ref = np.asarray(fgf_wta_low_maps(
        guide, ma, mb, (H, W), d_chunk=8, upsample_impl="lerp"
    ))
    got = np.asarray(fgf_wta_pallas(
        guide, *ma, mb, (H, W), d_chunk=8, interpret=True
    ))
    np.testing.assert_array_equal(got, ref)


def test_fgf_wta_pallas_vmap(rng):
    import jax

    from primestereomatch_tpu.kernels.wta_pallas import fgf_wta_pallas
    from primestereomatch_tpu.ops.guided_filter import fgf_low_maps

    B, H, W, D = 2, 32, 140, 8
    guide = jnp.asarray(rng.random((B, H, W, 3), dtype=np.float32))
    p_low = jnp.asarray(rng.random((B, D, H // 4, W // 4), dtype=np.float32))
    f = jax.vmap(lambda g, p: fgf_wta_pallas(
        g, *fgf_low_maps(g, p, 8, 1e-4, 4)[0],
        fgf_low_maps(g, p, 8, 1e-4, 4)[1],
        (H, W), d_chunk=8, interpret=True,
    ))
    out = np.asarray(f(guide, p_low))
    assert out.shape == (B, H, W)
    for b in range(B):
        ma, mb = fgf_low_maps(guide[b], p_low[b], 8, 1e-4, 4)
        ref = np.asarray(fgf_wta_pallas(
            guide[b], *ma, mb, (H, W), d_chunk=8, interpret=True
        ))
        np.testing.assert_array_equal(out[b], ref)


@pytest.mark.parametrize("H,W,D,s", [(128, 256, 16, 4), (96, 192, 8, 2), (64, 256, 8, 8)])
def test_lowmaps_pallas_matches_jnp(rng, H, W, D, s):
    """Fused low-res FGF chain == ops/guided_filter.py::fgf_low_maps up to
    float summation order, and the maps layout feeds fgf_wta_pallas_maps
    with identical disparities vs the XLA fgf_wta_low_maps path."""
    from primestereomatch_tpu.kernels.lowmaps_pallas import fgf_low_maps_pallas
    from primestereomatch_tpu.kernels.wta_pallas import fgf_wta_pallas_maps
    from primestereomatch_tpu.ops.guided_filter import fgf_low_maps, fgf_wta_low_maps

    h, w = H // s, W // s
    g = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    p = jnp.asarray(rng.random((D, h, w)).astype(np.float32))
    ma, mb = fgf_low_maps(g, p, 8, 1e-4, s)
    want = np.stack([np.asarray(t) for t in (*ma, mb)])
    got = np.asarray(fgf_low_maps_pallas(g, p, 8, 1e-4, s, interpret=True))
    # atol 2e-4: XLA CPU's reduce/fusion choices for the jnp reference vary
    # with process history (the s=8 case flaked at ~1e-4 only inside a full
    # -n 4 suite run; standalone both paths agree to <1e-6)
    assert np.allclose(got[:, :, :h, :w], want, atol=2e-4, rtol=1e-3)
    assert np.all(np.isfinite(got))  # junk outside (h, w) is weight-0 in WTA

    d_kernel = np.asarray(fgf_wta_pallas_maps(
        g, jnp.asarray(got), (h, w), (H, W), d_chunk=min(8, D), interpret=True
    ))
    d_xla = np.asarray(fgf_wta_low_maps(g, ma, mb, (H, W), d_chunk=D))
    assert (d_kernel != d_xla).mean() <= 2e-3


@pytest.mark.parametrize("H,W,D,s", [(128, 256, 16, 4), (124, 256, 16, 4), (96, 192, 8, 2)])
@pytest.mark.parametrize("poly", [False, True])
def test_cvc_lowmaps_fused_matches_composition(rng, H, W, D, s, poly):
    """Fused CVC+lowmaps kernel == build_cost_volumes_sampled ->
    fgf_low_maps_pallas up to float contraction (XLA may fuse the cost
    combine into an FMA in one program and not the other), for both views
    and both map layouts. Covers a non-divisible row count (124/4) where
    the row sample grid is a gather."""
    from primestereomatch_tpu.kernels.cvc_lowmaps_pallas import (
        cvc_fgf_low_maps_pallas,
        cvc_lowmaps_applicable,
    )
    from primestereomatch_tpu.kernels.lowmaps_pallas import fgf_low_maps_pallas
    from primestereomatch_tpu.kernels.wta_pallas import poly_col_params
    from primestereomatch_tpu.ops.cost_volume import build_cost_volumes_sampled
    from primestereomatch_tpu.ops.resize import nearest_indices

    h, w = H // s, W // s
    yi = nearest_indices(H, h)
    xi = nearest_indices(W, w)
    assert cvc_lowmaps_applicable(W, w, xi, D, s)
    l = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    r = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    lg = jnp.asarray(rng.random((H, W)).astype(np.float32))
    rg = jnp.asarray(rng.random((H, W)).astype(np.float32))
    if poly:
        pp = poly_col_params(w, W)
        kw = {"out_wp": pp["out_wp"], "out_margin": pp["margin"]}
        mgn = pp["margin"]
    else:
        kw, mgn = {}, 0
    lcv, rcv = build_cost_volumes_sampled(l, r, lg, rg, D, yi, xi)
    for is_left, cv, img, grd, o_img, o_grd in [
        (True, lcv, l, lg, r, rg), (False, rcv, r, rg, l, lg),
    ]:
        want = np.asarray(
            fgf_low_maps_pallas(img, cv, 8, 1e-4, s, interpret=True, **kw)
        )
        got = np.asarray(cvc_fgf_low_maps_pallas(
            img, grd, o_img, o_grd, is_left, D, yi, xi, 8, 1e-4, s,
            interpret=True, **kw,
        ))
        assert got.shape == want.shape
        assert np.isfinite(got).all()
        np.testing.assert_allclose(
            got[:, :, :h, mgn:mgn + w], want[:, :, :h, mgn:mgn + w],
            atol=5e-5, rtol=1e-3,
        )


def test_cvc_lowmaps_fused_tau_variant(rng):
    """tau1/tau2 OpenCL-variant clamps flow through the fused kernel."""
    from primestereomatch_tpu.kernels.cvc_lowmaps_pallas import (
        cvc_fgf_low_maps_pallas,
    )
    from primestereomatch_tpu.kernels.lowmaps_pallas import fgf_low_maps_pallas
    from primestereomatch_tpu.ops.cost_volume import build_cost_volumes_sampled
    from primestereomatch_tpu.ops.resize import nearest_indices

    H, W, D, s = 96, 256, 8, 4
    h, w = H // s, W // s
    yi = nearest_indices(H, h)
    xi = nearest_indices(W, w)
    l = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    r = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    lg = jnp.asarray(rng.random((H, W)).astype(np.float32))
    rg = jnp.asarray(rng.random((H, W)).astype(np.float32))
    lcv, _ = build_cost_volumes_sampled(
        l, r, lg, rg, D, yi, xi, tau1=0.3, tau2=0.05,
    )
    want = np.asarray(fgf_low_maps_pallas(l, lcv, 8, 1e-4, s, interpret=True))
    got = np.asarray(cvc_fgf_low_maps_pallas(
        l, lg, r, rg, True, D, yi, xi, 8, 1e-4, s,
        tau1=0.3, tau2=0.05, interpret=True,
    ))
    np.testing.assert_allclose(
        got[:, :, :h, :w], want[:, :, :h, :w], atol=5e-5, rtol=1e-3
    )


@pytest.mark.parametrize("H,W,D,s", [(128, 256, 16, 4), (96, 256, 8, 2), (64, 512, 8, 8), (120, 640, 16, 4)])
def test_wta_poly_matches_matmul_kernel(rng, H, W, D, s):
    """Polyphase column WTA (static lane slices + per-phase lerps) vs the
    generic banded-matmul kernel at exact integer column upscaling: the
    poly kernel combines the maps with the guide BEFORE the column lerp
    (algebraically equal, last-ulp rounding differs), so only knife-edge
    argmin ties may differ — bounded mismatch rate, not bitwise. Covers
    the left-edge XLA fixup columns and a non-multiple-of-TWQ width
    (640/4). Tile-geometry variants of the poly kernel itself must stay
    bitwise-identical (same arithmetic, different tiling)."""
    from primestereomatch_tpu.kernels.lowmaps_pallas import fgf_low_maps_pallas
    from primestereomatch_tpu.kernels.wta_pallas import (
        fgf_wta_pallas_maps,
        poly_col_params,
    )

    h, w = H // s, W // s
    pp = poly_col_params(w, W)
    assert pp is not None and pp["P"] == s
    g = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    p = jnp.asarray(rng.random((D, h, w)).astype(np.float32))
    maps_plain = fgf_low_maps_pallas(g, p, 8, 1e-4, s, interpret=True)
    ref = np.asarray(fgf_wta_pallas_maps(
        g, maps_plain, (h, w), (H, W), d_chunk=min(8, D), interpret=True
    ))
    maps_poly = fgf_low_maps_pallas(
        g, p, 8, 1e-4, s, out_wp=pp["out_wp"], out_margin=pp["margin"],
        interpret=True,
    )
    assert maps_poly.shape[-1] == pp["margin"] + pp["out_wp"]
    got = np.asarray(fgf_wta_pallas_maps(
        g, maps_poly, (h, w), (H, W), d_chunk=min(8, D), poly=True,
        interpret=True,
    ))
    assert (got != ref).mean() <= 1e-3
    # plain-layout maps route through the same poly path (re-padded into
    # the margin layout; explicit maps_layout since tight single-tile
    # margins can make plain and poly widths coincide)
    got2 = np.asarray(fgf_wta_pallas_maps(
        g, maps_plain, (h, w), (H, W), d_chunk=min(8, D), poly=True,
        maps_layout="plain", interpret=True,
    ))
    np.testing.assert_array_equal(got2, got)
    # tunable tile geometry (tile_h / poly_twq) must not change results
    for th, twq in ((32, None), (None, 128), (64, 128)):
        pv = poly_col_params(w, W, twq=twq)
        maps_v = fgf_low_maps_pallas(
            g, p, 8, 1e-4, s, out_wp=pv["out_wp"], out_margin=pv["margin"],
            interpret=True,
        )
        got_v = np.asarray(fgf_wta_pallas_maps(
            g, maps_v, (h, w), (H, W), d_chunk=min(8, D), poly=True,
            tile_h=th, poly_twq=twq, interpret=True,
        ))
        np.testing.assert_array_equal(got_v, got)


def test_wta_poison_d0_and_exact_batched(rng):
    """Producer-side d=0 poison (lowmaps poison_d0=True: a_*=0,
    b=D0_POISON) + consumer mask_d0=False must reproduce the in-kernel
    inf-masked results bitwise — q(d=0)=D0_POISON loses every argmin just
    like inf, without the per-chunk compare+select. Also: batched launches
    at EXACT integer ratios now use the same static per-phase mode + XLA
    edge fixup as single-frame dispatch — bitwise equal per frame."""
    from primestereomatch_tpu.kernels.lowmaps_pallas import (
        fgf_low_maps_pallas,
        fgf_low_maps_pallas_batched,
    )
    from primestereomatch_tpu.kernels.wta_pallas import (
        fgf_wta_pallas_maps,
        fgf_wta_pallas_maps_batched,
        poly_col_params,
    )

    H, W, D, s = 96, 256, 16, 4
    h, w = H // s, W // s
    pp = poly_col_params(w, W)
    assert pp is not None and pp["exact"]
    g = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    p = jnp.asarray(rng.random((D, h, w)).astype(np.float32))
    kw = dict(out_wp=pp["out_wp"], out_margin=pp["margin"], interpret=True)

    maps_ref = fgf_low_maps_pallas(g, p, 8, 1e-4, s, **kw)
    ref = np.asarray(fgf_wta_pallas_maps(
        g, maps_ref, (h, w), (H, W), d_chunk=8, poly=True, interpret=True
    ))
    maps_poi = fgf_low_maps_pallas(g, p, 8, 1e-4, s, poison_d0=True, **kw)
    # only the d=0 slice differs
    np.testing.assert_array_equal(
        np.asarray(maps_poi[:, 1:]), np.asarray(maps_ref[:, 1:])
    )
    got = np.asarray(fgf_wta_pallas_maps(
        g, maps_poi, (h, w), (H, W), d_chunk=8, poly=True, mask_d0=False,
        interpret=True,
    ))
    np.testing.assert_array_equal(got, ref)

    # generic (non-poly) kernel honours mask_d0=False the same way
    maps_ref_p = fgf_low_maps_pallas(g, p, 8, 1e-4, s, interpret=True)
    maps_poi_p = fgf_low_maps_pallas(
        g, p, 8, 1e-4, s, poison_d0=True, interpret=True
    )
    ref_g = np.asarray(fgf_wta_pallas_maps(
        g, maps_ref_p, (h, w), (H, W), d_chunk=8, interpret=True
    ))
    got_g = np.asarray(fgf_wta_pallas_maps(
        g, maps_poi_p, (h, w), (H, W), d_chunk=8, mask_d0=False,
        interpret=True,
    ))
    np.testing.assert_array_equal(got_g, ref_g)

    # batched exact-ratio: static mode + batched fixup == per-frame
    B = 2
    gb = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    pb = jnp.asarray(rng.random((B, D, h, w)).astype(np.float32))
    maps_b = fgf_low_maps_pallas_batched(
        gb, pb, 8, 1e-4, s, poison_d0=True, **kw
    )
    disp_b = np.asarray(fgf_wta_pallas_maps_batched(
        gb, maps_b, (h, w), (H, W), d_chunk=8, poly=True, mask_d0=False,
        interpret=True,
    ))
    for i in range(B):
        maps_i = fgf_low_maps_pallas(
            gb[i], pb[i], 8, 1e-4, s, poison_d0=True, **kw
        )
        disp_i = np.asarray(fgf_wta_pallas_maps(
            gb[i], maps_i, (h, w), (H, W), d_chunk=8, poly=True,
            mask_d0=False, interpret=True,
        ))
        np.testing.assert_array_equal(disp_b[i], disp_i)


def test_wta_maps_entry_vmap(rng):
    """jax.vmap of the Pallas maps entry folds the batch into ONE
    fgf_wta_pallas_maps_batched launch — per-frame bitwise equal. This is
    what makes jax.vmap(stereo_gif_forward) viable with the default
    Pallas impls (the round-3 25x vmap trap)."""
    import jax

    from primestereomatch_tpu.kernels.lowmaps_pallas import fgf_low_maps_pallas
    from primestereomatch_tpu.kernels.wta_pallas import (
        fgf_wta_pallas_maps,
        poly_col_params,
    )

    B, H, W, D, s = 2, 96, 256, 16, 4
    h, w = H // s, W // s
    pp = poly_col_params(w, W)
    g = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    p = jnp.asarray(rng.random((B, D, h, w)).astype(np.float32))
    kw = dict(out_wp=pp["out_wp"], out_margin=pp["margin"], interpret=True)
    maps = jax.vmap(
        lambda gg, pq: fgf_low_maps_pallas(gg, pq, 8, 1e-4, s, **kw)
    )(g, p)
    out = np.asarray(jax.vmap(
        lambda gg, mm: fgf_wta_pallas_maps(
            gg, mm, (h, w), (H, W), d_chunk=8, poly=True, interpret=True
        )
    )(g, maps))
    for i in range(B):
        ref = np.asarray(fgf_wta_pallas_maps(
            g[i], maps[i], (h, w), (H, W), d_chunk=8, poly=True,
            interpret=True,
        ))
        np.testing.assert_array_equal(out[i], ref)


def test_cvc_lowmaps_vmap(rng):
    """jax.vmap of the fused CVC+lowmaps entry (sequential per-frame
    dispatch) equals per-frame calls up to XLA fusion of the float prep
    (the stats/_color_inverse_cov math fuses differently under lax.map —
    same tolerance class as test_cvc_lowmaps_fused_matches_composition)."""
    import jax

    from primestereomatch_tpu.kernels.cvc_lowmaps_pallas import (
        cvc_fgf_low_maps_pallas,
    )
    from primestereomatch_tpu.ops.resize import nearest_indices

    B, H, W, D, s = 2, 64, 256, 8, 4
    h, w = H // s, W // s
    yi = nearest_indices(H, h)
    xi = nearest_indices(W, w)
    l = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    r = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    lg = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    rg = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    fn = lambda a, ag, b, bg: cvc_fgf_low_maps_pallas(  # noqa: E731
        a, ag, b, bg, True, D, yi, xi, 8, 1e-4, s, interpret=True
    )
    out = np.asarray(jax.vmap(fn)(l, lg, r, rg))
    for i in range(B):
        ref = np.asarray(fn(l[i], lg[i], r[i], rg[i]))
        np.testing.assert_allclose(out[i], ref, atol=5e-5, rtol=1e-3)


def test_batched_entries_vmap(rng):
    """jax.vmap of the BATCHED fold entries folds the vmap axis into the
    existing frame fold (what jax.vmap(stereo_gif_forward) hits at quasi
    ratios where the pipeline itself uses the 2-view fold)."""
    import jax

    from primestereomatch_tpu.kernels.lowmaps_pallas import (
        fgf_low_maps_pallas_batched,
    )
    from primestereomatch_tpu.kernels.wta_pallas import (
        fgf_wta_pallas_maps_batched,
        poly_col_params,
    )

    Bv, B, H, W, D, s = 2, 2, 128, 96, 8, 2
    h, w = H // s, W // s
    pp = poly_col_params(w, W)
    kw = dict(out_wp=pp["out_wp"], out_margin=pp["margin"], interpret=True)
    g = jnp.asarray(rng.random((Bv, B, H, W, 3)).astype(np.float32))
    p = jnp.asarray(rng.random((Bv, B, D, h, w)).astype(np.float32))

    fn_low = lambda gg, pq: fgf_low_maps_pallas_batched(  # noqa: E731
        gg, pq, 8, 1e-4, s, **kw
    )
    maps_v = jax.vmap(fn_low)(g, p)
    fn_wta = lambda gg, mm: fgf_wta_pallas_maps_batched(  # noqa: E731
        gg, mm, (h, w), (H, W), d_chunk=4, poly=True, interpret=True
    )
    out_v = np.asarray(jax.vmap(fn_wta)(g, maps_v))
    for i in range(Bv):
        maps_i = fn_low(g[i], p[i])
        np.testing.assert_array_equal(np.asarray(maps_v[i]), np.asarray(maps_i))
        out_i = np.asarray(fn_wta(g[i], maps_i))
        np.testing.assert_array_equal(out_v[i], out_i)


def test_lowmaps_pallas_vmap(rng):
    from primestereomatch_tpu.kernels.lowmaps_pallas import fgf_low_maps_pallas
    import jax

    B, H, W, D, s = 2, 64, 128, 8, 4
    g = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    p = jnp.asarray(rng.random((B, D, H // s, W // s)).astype(np.float32))
    fn = lambda gg, pp: fgf_low_maps_pallas(gg, pp, 8, 1e-4, s, interpret=True)
    batched = np.asarray(jax.vmap(fn)(g, p))
    for i in range(B):
        single = np.asarray(fn(g[i], p[i]))
        np.testing.assert_array_equal(batched[i], single)


def test_batched_fold_matches_per_frame(rng):
    """Folded-batch lowmaps + generic WTA (ONE pallas_call each, frames on
    the row-tile grid axis) must be bitwise-equal to per-frame dispatch."""
    from primestereomatch_tpu.kernels.lowmaps_pallas import (
        fgf_low_maps_pallas,
        fgf_low_maps_pallas_batched,
    )
    from primestereomatch_tpu.kernels.wta_pallas import (
        fgf_wta_pallas_maps,
        fgf_wta_pallas_maps_batched,
        poly_col_params,
    )

    B, H, W, D, s = 3, 60, 90, 8, 2
    # deliberately NOT the H//s grid: w=48 gives a sub-2x column ratio, the
    # one shape class the (quasi-)polyphase variant cannot take
    h, w = 30, 48
    assert poly_col_params(w, W) is None  # generic-kernel shape
    g = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    p = jnp.asarray(rng.random((B, D, h, w)).astype(np.float32))

    maps_b = fgf_low_maps_pallas_batched(g, p, 8, 1e-4, s, interpret=True)
    disp_b = np.asarray(fgf_wta_pallas_maps_batched(
        g, maps_b, (h, w), (H, W), d_chunk=4, interpret=True
    ))
    HPf = maps_b.shape[2] // B
    for i in range(B):
        maps_i = fgf_low_maps_pallas(g[i], p[i], 8, 1e-4, s, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(maps_b[:, :, i * HPf:(i + 1) * HPf]),
            np.asarray(maps_i),
        )
        disp_i = np.asarray(fgf_wta_pallas_maps(
            g[i], maps_i, (h, w), (H, W), d_chunk=4, interpret=True
        ))
        np.testing.assert_array_equal(disp_b[i], disp_i)


@pytest.mark.parametrize("H,W,D,s", [(96, 450, 16, 4), (64, 447, 8, 4)])
def test_wta_quasi_poly_matches_generic(rng, H, W, D, s):
    """QUASI-polyphase column WTA (per-lane masked tap select over the
    four static windows) vs the generic banded-matmul kernel at the
    non-integer Middlebury ratios: 450 = 4*112 + 2 (drift e in {-1, 0})
    and 447 = 4*111 + 3 (drift reaches -2). The poly kernel combines the
    maps with the guide BEFORE the column lerp, so only knife-edge argmin
    ties may differ (bounded rate; same taps/weights — the masked tables
    come from the true linear_coeffs everywhere, edges included). The
    batch-folded poly launch (always masked mode) must stay bitwise-equal
    to per-frame poly dispatch (identical arithmetic)."""
    from primestereomatch_tpu.kernels.lowmaps_pallas import (
        fgf_low_maps_pallas,
        fgf_low_maps_pallas_batched,
    )
    from primestereomatch_tpu.kernels.wta_pallas import (
        fgf_wta_pallas_maps,
        fgf_wta_pallas_maps_batched,
        poly_col_params,
    )

    h, w = H // s, W // s
    pp = poly_col_params(w, W)
    assert pp is not None and not pp["exact"] and pp["P"] == s
    g = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    p = jnp.asarray(rng.random((D, h, w)).astype(np.float32))
    maps_plain = fgf_low_maps_pallas(g, p, 8, 1e-4, s, interpret=True)
    ref = np.asarray(fgf_wta_pallas_maps(
        g, maps_plain, (h, w), (H, W), d_chunk=min(8, D), interpret=True
    ))
    maps_poly = fgf_low_maps_pallas(
        g, p, 8, 1e-4, s, out_wp=pp["out_wp"], out_margin=pp["margin"],
        interpret=True,
    )
    got = np.asarray(fgf_wta_pallas_maps(
        g, maps_poly, (h, w), (H, W), d_chunk=min(8, D), poly=True,
        interpret=True,
    ))
    assert (got != ref).mean() <= 1e-3

    B = 2
    gb = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    pb = jnp.asarray(rng.random((B, D, h, w)).astype(np.float32))
    maps_b = fgf_low_maps_pallas_batched(
        gb, pb, 8, 1e-4, s, out_wp=pp["out_wp"], out_margin=pp["margin"],
        interpret=True,
    )
    disp_b = np.asarray(fgf_wta_pallas_maps_batched(
        gb, maps_b, (h, w), (H, W), d_chunk=min(8, D), poly=True,
        interpret=True,
    ))
    for i in range(B):
        maps_i = fgf_low_maps_pallas(
            gb[i], pb[i], 8, 1e-4, s, out_wp=pp["out_wp"],
            out_margin=pp["margin"], interpret=True,
        )
        disp_i = np.asarray(fgf_wta_pallas_maps(
            gb[i], maps_i, (h, w), (H, W), d_chunk=min(8, D), poly=True,
            interpret=True,
        ))
        np.testing.assert_array_equal(disp_b[i], disp_i)


@pytest.mark.parametrize(
    "H,W,D,nd,bound",
    [(40, 56, 16, 8, 9450), (33, 45, 16, 5, 9450), (24, 64, 32, 3, 9450),
     (48, 48, 16, 8, None)],
)
def test_sgbm_aggregate_pallas_matches_xla(rng, H, W, D, nd, bound):
    """The VMEM-carry scan kernel must be bit-exact vs the XLA lax.scan
    aggregation for all three direction modes, with and without the
    narrow-dtype bound (int32 fallback)."""
    from primestereomatch_tpu.kernels.sgbm_pallas import sgbm_aggregate_pallas
    from primestereomatch_tpu.ops.sgbm import aggregate

    C = jnp.asarray(rng.integers(0, 9450, (H, W, D)).astype(np.int32))
    ref = np.asarray(aggregate(C, 600, 2400, nd, cost_bound=bound))
    got = np.asarray(sgbm_aggregate_pallas(
        C, 600, 2400, nd, cost_bound=bound, interpret=True
    ))
    np.testing.assert_array_equal(got, ref)
    # layout knobs (the pipeline's dhw -> hdw fast path) are value-identical
    got2 = np.asarray(sgbm_aggregate_pallas(
        jnp.transpose(C, (2, 0, 1)), 600, 2400, nd, cost_bound=bound,
        interpret=True, in_layout="dhw", out_layout="hdw",
    ))
    np.testing.assert_array_equal(np.transpose(got2, (0, 2, 1)), ref)


@pytest.mark.parametrize("budget", [1, 250_000])
def test_sgbm_aggregate_pallas_split_launch(rng, monkeypatch, budget):
    """Force the VMEM planner into its fallback shapes: budget=250k picks
    small rows-per-step, budget=1 forces the forward/backward launch
    split (2K/d=256 territory) — both must stay bit-exact."""
    import primestereomatch_tpu.kernels.sgbm_pallas as sp
    from primestereomatch_tpu.ops.sgbm import aggregate

    monkeypatch.setattr(sp, "_VMEM_BUDGET", budget)
    # shape must differ per budget case: the planner reads the budget at
    # trace time, so a jit cache hit would reuse the other plan
    H, W, D = 40, (52 if budget == 250_000 else 60), 16
    C = jnp.asarray(rng.integers(0, 9450, (H, W, D)).astype(np.int32))
    ref = np.asarray(aggregate(C, 600, 2400, 8, cost_bound=9450))
    got = np.asarray(sp.sgbm_aggregate_pallas(
        C, 600, 2400, 8, cost_bound=9450, interpret=True
    ))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("H,W", [(24, 40), (17, 150), (130, 33)])
def test_segmin_sweep_pallas_matches_xla(rng, H, W):
    """The VMEM-resident segmented min-scan sweep (both directions fused)
    must equal the associative_scan formulation used by filter_speckles."""
    from jax import lax

    from primestereomatch_tpu.kernels.speckle_pallas import segmin_sweep_pallas

    m = jnp.asarray(rng.integers(0, H * W, (H, W)).astype(np.int32))
    conn_lf = jnp.asarray(rng.random((H, W)) < 0.7).at[:, 0].set(False)
    conn_up = jnp.asarray(rng.random((H, W)) < 0.7).at[0].set(False)

    def comb(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, jnp.minimum(av, bv), bv), af & bf

    # rows: fwd with conn_lf; bwd = fwd on the flipped image with
    # conn_rt = shift(conn_lf) — the filter_speckles formulation
    conn_rt = jnp.concatenate(
        [conn_lf[:, 1:], jnp.zeros_like(conn_lf[:, :1])], axis=1
    )
    r, _ = lax.associative_scan(
        comb,
        (jnp.stack([m, m[:, ::-1]]), jnp.stack([conn_lf, conn_rt[:, ::-1]])),
        axis=2,
    )
    want_rows = jnp.minimum(r[0], r[1][:, ::-1])
    got_rows = segmin_sweep_pallas(m, conn_lf, axis=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_rows), np.asarray(want_rows))

    conn_dn = jnp.concatenate(
        [conn_up[1:], jnp.zeros_like(conn_up[:1])], axis=0
    )
    c, _ = lax.associative_scan(
        comb,
        (jnp.stack([m, m[::-1]]), jnp.stack([conn_up, conn_dn[::-1]])),
        axis=1,
    )
    want_cols = jnp.minimum(c[0], c[1][::-1])
    got_cols = segmin_sweep_pallas(m, conn_up, axis=0, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_cols), np.asarray(want_cols))


@pytest.mark.parametrize("H,W,D,k", [(20, 30, 16, 5), (16, 40, 8, 3)])
def test_bt_block_cost_pallas_matches_op(rng, H, W, D, k):
    """Fused Pallas BT+block-sum == the XLA op on the logical region;
    padding lanes/rows are zero (scan-neutral for the aggregation)."""
    from primestereomatch_tpu.kernels.sgbm_pallas import bt_block_cost_pallas
    from primestereomatch_tpu.ops.sgbm import bt_block_cost, clipped_xderiv

    l = jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    lf = clipped_xderiv(l, 63)
    rf = clipped_xderiv(r, 63)
    bound = k * k * 3 * 2 * 63
    want = np.asarray(bt_block_cost(lf, rf, D, k, cost_bound=bound,
                                    feat_bound=126, out_layout="dhw"))
    got = np.array(bt_block_cost_pallas(lf, rf, D, k, cost_bound=bound,
                                        interpret=True))
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got[:, :H, :W], want)
    got[:, :H, :W] = 0
    assert (got == 0).all(), "padding must be zero (scan-neutral)"


@pytest.mark.parametrize("nd", [8, 5, 3])
@pytest.mark.parametrize("uniq,d12", [(10, 1), (0, -1)])
def test_sgbm_select_partials_pallas(rng, nd, uniq, d12):
    """Fused selection from the aggregation's partial sums must be
    BIT-identical to select_disparity_hdw(sum) — on RANDOM volumes (the
    regime where wrong-lane diagonal reads diverge, per the round-2
    advisor finding on the barrel-shift gather) and for all direction
    modes / uniqueness / LR settings."""
    from primestereomatch_tpu.kernels.select_pallas import (
        select_disparity_partials_pallas,
    )
    from primestereomatch_tpu.kernels.sgbm_pallas import (
        sgbm_aggregate_partials_pallas,
    )
    from primestereomatch_tpu.ops.sgbm import select_disparity_hdw

    H, W, D = 26, 44, 16
    bound = 9450
    C = jnp.asarray(rng.integers(0, bound, (H, W, D)).astype(np.int32))
    parts = sgbm_aggregate_partials_pallas(
        C, 600, 2400, nd, cost_bound=bound, interpret=True
    )
    S = sum(q[:H, :, :W].astype(jnp.int32) for q in parts)
    want = np.asarray(select_disparity_hdw(S, uniq, d12, 0))
    got = np.asarray(select_disparity_partials_pallas(
        parts, (H, W), uniq, d12, 0, interpret=True
    ))
    np.testing.assert_array_equal(got, want)
    # single-pass packed-key kernel (value_bound enables it): same bits
    got1p = np.asarray(select_disparity_partials_pallas(
        parts, (H, W), uniq, d12, 0,
        value_bound=nd * (bound + 2400), interpret=True,
    ))
    np.testing.assert_array_equal(got1p, want)


def test_sgbm_padded_cost_to_aggregate(rng):
    """bt_block_cost_pallas's zero-padded volume through the aggregation
    with logical_hw must equal the unpadded XLA pipeline exactly (the
    zero padding is scan-neutral)."""
    from primestereomatch_tpu.kernels.sgbm_pallas import (
        bt_block_cost_pallas,
        sgbm_aggregate_pallas,
    )
    from primestereomatch_tpu.ops.sgbm import aggregate, bt_block_cost, clipped_xderiv

    H, W, D, k = 21, 43, 16, 5
    l = jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    lf, rf = clipped_xderiv(l, 63), clipped_xderiv(r, 63)
    bound = k * k * 3 * 2 * 63
    C_ref = bt_block_cost(lf, rf, D, k, cost_bound=bound, feat_bound=126)
    want = np.transpose(
        np.asarray(aggregate(C_ref.astype(jnp.int32), 600, 2400, 8,
                             cost_bound=bound)),
        (0, 2, 1),
    )
    Cp = bt_block_cost_pallas(lf, rf, D, k, cost_bound=bound, interpret=True)
    got = np.asarray(sgbm_aggregate_pallas(
        Cp, 600, 2400, 8, cost_bound=bound, interpret=True,
        in_layout="dhw", out_layout="hdw", logical_hw=(H, W),
    ))
    np.testing.assert_array_equal(got, want)
    # the pipeline's zero-copy handoff: hdw cost layout (y-scan-ready,
    # emitted by the cost kernel) with padded rows must stay identical
    Ch = bt_block_cost_pallas(
        lf, rf, D, k, cost_bound=bound, rows_to=128, out_layout="hdw",
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(Ch), np.transpose(np.asarray(
            bt_block_cost_pallas(lf, rf, D, k, cost_bound=bound,
                                 rows_to=128, interpret=True)
        ), (1, 0, 2)),
    )
    got_h = np.asarray(sgbm_aggregate_pallas(
        Ch, 600, 2400, 8, cost_bound=bound, interpret=True,
        in_layout="hdw", out_layout="hdw", logical_hw=(H, W),
    ))
    np.testing.assert_array_equal(got_h, want)


@pytest.mark.parametrize("nd", [3, 5, 8])
def test_sgbm_aggregate_dhw_direct_consumption(rng, monkeypatch, nd):
    """Under a tiny VMEM budget (2K-class planning) the y-scans consume
    the (D, Hp, Wp) cost DIRECTLY via squeezed (Dp, None, Np) blocks
    (in_layout='dtn', R=1) instead of a transposed copy — and the x pair
    absorbs its fwd partial in the bwd launch. Must stay bit-exact vs the
    XLA aggregate in every direction mode."""
    import primestereomatch_tpu.kernels.sgbm_pallas as sp
    from primestereomatch_tpu.ops.sgbm import aggregate

    monkeypatch.setattr(sp, "_VMEM_BUDGET", 1)
    H, W, D = 26, 44, 16
    C = jnp.asarray(rng.integers(0, 9450, (H, W, D)).astype(np.int32))
    want = np.transpose(
        np.asarray(aggregate(C, 600, 2400, nd, cost_bound=9450)), (0, 2, 1)
    )
    Cd = jnp.transpose(C, (2, 0, 1))            # (D, H, W) producer layout
    got = np.asarray(sp.sgbm_aggregate_pallas(
        Cd, 600, 2400, nd, cost_bound=9450, interpret=True,
        in_layout="dhw", out_layout="hdw", logical_hw=(H, W),
    ))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "H,W,D,s", [(128, 256, 16, 4), (126, 256, 16, 4), (96, 192, 8, 2)]
)
def test_cvc_wta_fused_matches_composition(rng, H, W, D, s):
    """FULLY fused CVC+maps+WTA kernel (kernels/cvc_wta_pallas.py) ==
    cvc_fgf_low_maps_pallas -> fgf_wta_pallas_maps(poly) on columns
    >= ncl (bitwise: shared chain code, weight-0-exact row matmul); the
    ncl clamped left columns are recomputed from the XLA strip chain,
    where only knife-edge argmin ties may differ. Covers non-divisible
    rows (126/4) and P=2."""
    from primestereomatch_tpu.kernels.cvc_lowmaps_pallas import (
        cvc_fgf_low_maps_pallas,
    )
    from primestereomatch_tpu.kernels.cvc_wta_pallas import (
        cvc_fgf_wta_pallas,
        cvc_wta_applicable,
    )
    from primestereomatch_tpu.kernels.wta_pallas import (
        fgf_wta_pallas_maps,
        poly_col_params,
    )
    from primestereomatch_tpu.ops.resize import nearest_indices

    h, w = H // s, W // s
    yi = nearest_indices(H, h)
    xi = nearest_indices(W, w)
    assert cvc_wta_applicable(W, w, xi, D, s, H, h)
    pp = poly_col_params(w, W)
    assert pp is not None and pp["exact"]
    ncl = pp["ncl"]
    l = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    r = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    lg = jnp.asarray(rng.random((H, W)).astype(np.float32))
    rg = jnp.asarray(rng.random((H, W)).astype(np.float32))
    for is_left, img, grd, o_img, o_grd in [
        (True, l, lg, r, rg), (False, r, rg, l, lg),
    ]:
        maps = cvc_fgf_low_maps_pallas(
            img, grd, o_img, o_grd, is_left, D, yi, xi, 8, 1e-4, s,
            out_wp=pp["out_wp"], out_margin=pp["margin"], poison_d0=True,
            interpret=True,
        )
        want = np.asarray(fgf_wta_pallas_maps(
            img, maps, (h, w), (H, W), d_chunk=min(8, D), poly=True,
            mask_d0=False, maps_layout="poly", interpret=True,
        ))
        got = np.asarray(cvc_fgf_wta_pallas(
            img, grd, o_img, o_grd, is_left, D, yi, xi, 8, 1e-4, s,
            interpret=True,
        ))
        np.testing.assert_array_equal(got[:, ncl:], want[:, ncl:])
        # clamped left columns: strip-chain recompute, last-ulp ties only
        assert (got[:, :ncl] != want[:, :ncl]).mean() <= 5e-3


def test_cvc_wta_fused_tau_and_tile_h(rng):
    """tau clamps flow through the fused CVC+WTA kernel, and the tile
    height only changes the schedule (bitwise-equal outputs)."""
    from primestereomatch_tpu.kernels.cvc_wta_pallas import cvc_fgf_wta_pallas
    from primestereomatch_tpu.ops.resize import nearest_indices

    H, W, D, s = 96, 256, 8, 4
    h, w = H // s, W // s
    yi = nearest_indices(H, h)
    xi = nearest_indices(W, w)
    l = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    r = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    lg = jnp.asarray(rng.random((H, W)).astype(np.float32))
    rg = jnp.asarray(rng.random((H, W)).astype(np.float32))
    kw = dict(tau1=0.3, tau2=0.05, interpret=True)
    a = np.asarray(cvc_fgf_wta_pallas(
        l, lg, r, rg, True, D, yi, xi, 8, 1e-4, s, tile_h=32, **kw))
    b = np.asarray(cvc_fgf_wta_pallas(
        l, lg, r, rg, True, D, yi, xi, 8, 1e-4, s, tile_h=16, **kw))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (H, W) and a.dtype == np.uint8
    assert a.max() < D and (a > 0).any()


def test_select_partials_min_disparity(rng):
    """min_disparity > 0 through BOTH select kernels (the packed walk's
    final dmin+minD shift and the lookup range offset) — bit-exact vs
    the XLA select."""
    from primestereomatch_tpu.kernels.select_pallas import (
        select_disparity_partials_pallas,
    )
    from primestereomatch_tpu.kernels.sgbm_pallas import (
        sgbm_aggregate_partials_pallas,
    )
    from primestereomatch_tpu.ops.sgbm import select_disparity_hdw

    H, W, D, min_d = 26, 44, 16, 4
    bound = 9450
    C = jnp.asarray(rng.integers(0, bound, (H, W, D)).astype(np.int32))
    parts = sgbm_aggregate_partials_pallas(
        C, 600, 2400, 8, cost_bound=bound, interpret=True
    )
    S = sum(q[:H, :, :W].astype(jnp.int32) for q in parts)
    want = np.asarray(select_disparity_hdw(S, 10, 1, min_d))
    for vb in (None, 8 * (bound + 2400)):
        got = np.asarray(select_disparity_partials_pallas(
            parts, (H, W), 10, 1, min_d, value_bound=vb, interpret=True,
        ))
        np.testing.assert_array_equal(got, want)
