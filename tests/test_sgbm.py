"""SGBM path: per-stage bit-exact checks vs the NumPy oracle
(tests/oracle_sgbm.py, the executable spec) + end-to-end quality on
Middlebury vs ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

import tests.oracle_sgbm as oracle
from primestereomatch_tpu.config import SGBMConfig
from primestereomatch_tpu.models.sgbm_pipeline import (
    StereoSGBM,
    sgbm_display_u8,
    stereo_sgbm_forward,
)
from primestereomatch_tpu.ops import sgbm as ops
from primestereomatch_tpu.utils.eval import bad_pixel_metrics


@pytest.fixture(scope="module")
def pair(rng=None):
    rng = np.random.default_rng(7)
    H, W = 16, 24
    l = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    # right = left shifted by ~3 px + noise
    r = np.roll(l, -3, axis=1)
    r = np.clip(r.astype(np.int32) + rng.integers(-6, 7, r.shape), 0, 255).astype(np.uint8)
    return l, r


CAP, D, K, P1, P2 = 63, 8, 5, 24, 96


def test_clipped_xderiv(pair):
    l, _ = pair
    got = np.asarray(ops.clipped_xderiv(jnp.asarray(l), CAP))
    want = oracle.clipped_xderiv(l, CAP)
    np.testing.assert_array_equal(got, want)


def test_sobel_xclip(pair):
    l, _ = pair
    got = np.asarray(ops.sobel_xclip(jnp.asarray(l), CAP))
    want = oracle.sobel_xclip(l, CAP)
    np.testing.assert_array_equal(got, want)


def test_bt_cost(pair):
    l, r = pair
    lf = oracle.clipped_xderiv(l, CAP)
    rf = oracle.clipped_xderiv(r, CAP)
    got = np.asarray(ops._bt_cost_1d(jnp.asarray(lf), jnp.asarray(rf), D))
    want = oracle.bt_cost(lf, rf, D)
    np.testing.assert_array_equal(got, want)


def test_block_cost(pair):
    l, r = pair
    pix = oracle.bt_cost(
        oracle.clipped_xderiv(l, CAP), oracle.clipped_xderiv(r, CAP), D
    )
    got = np.asarray(ops.block_cost(jnp.asarray(pix, jnp.int32), K))
    want = oracle.block_cost(pix, K)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("d,k", [(8, 5), (12, 3), (8, 1), (16, 5)])
def test_bt_block_cost_fused(pair, d, k):
    # the fused pipeline path (per-d-chunk separable window sum, int16
    # writes) must equal the two-stage oracle composition exactly
    l, r = pair
    lf = oracle.clipped_xderiv(l, CAP)
    rf = oracle.clipped_xderiv(r, CAP)
    want = oracle.block_cost(oracle.bt_cost(lf, rf, d), k)
    bound = k * k * 3 * 2 * CAP
    got = np.asarray(
        ops.bt_block_cost(jnp.asarray(lf), jnp.asarray(rf), d, k,
                          cost_bound=bound, feat_bound=2 * CAP)
    )
    assert got.dtype == (np.int16 if bound < 2**15 else np.int32)
    np.testing.assert_array_equal(got, want)
    # int32 path (no bound supplied) identical too
    got32 = np.asarray(ops.bt_block_cost(jnp.asarray(lf), jnp.asarray(rf), d, k))
    np.testing.assert_array_equal(got32, want)
    # the pipeline's (D, H, W) layout is a pure transpose of the same values
    dhw = np.asarray(
        ops.bt_block_cost(jnp.asarray(lf), jnp.asarray(rf), d, k,
                          cost_bound=bound, feat_bound=2 * CAP,
                          out_layout="dhw")
    )
    np.testing.assert_array_equal(np.transpose(dhw, (1, 2, 0)), want)


def test_select_disparity_hdw_matches(pair):
    l, r = pair
    S = oracle.aggregate(
        oracle.block_cost(
            oracle.bt_cost(
                oracle.clipped_xderiv(l, CAP), oracle.clipped_xderiv(r, CAP), D
            ),
            K,
        ),
        P1, P2, 8,
    )
    ref = np.asarray(
        ops.select_disparity(jnp.asarray(S, jnp.int32), 10, 1, 0)
    )
    got = np.asarray(
        ops.select_disparity_hdw(
            jnp.asarray(np.transpose(S, (0, 2, 1)), jnp.int32), 10, 1, 0
        )
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize(
    "uniq,d12", [(10, 1), (0, 0), (10, -1), (5, 2)]
)
def test_select_disparity_hdw_matches_random(uniq, d12):
    """Randomized differential check: on random volumes d_best varies
    violently between adjacent lanes, which is exactly what broke the old
    barrel-shift rd gather (smooth images masked it — wrong-lane reads
    usually returned the same rd value). Must be exact for every
    (uniqueness, disp12) setting including disp12_max_diff >= 0."""
    rng = np.random.default_rng(11)
    H, W, D = 24, 96, 16
    S = rng.integers(0, 5000, (H, W, D)).astype(np.int32)
    ref = np.asarray(ops.select_disparity(jnp.asarray(S), uniq, d12, 0))
    got = np.asarray(
        ops.select_disparity_hdw(
            jnp.asarray(np.transpose(S, (0, 2, 1))), uniq, d12, 0
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_select_disparity_hdw_matches_structured_noise():
    """Structured-noise variant: piecewise-constant disparity field with
    abrupt jumps plus noise — adjacent lanes mostly agree but jump by
    large deltas at block seams (the regime between smooth and random)."""
    rng = np.random.default_rng(13)
    H, W, D = 32, 128, 32
    base = np.repeat(rng.integers(0, D, (H, W // 8)), 8, axis=1)
    d_idx = np.arange(D)[None, None, :]
    S = (np.abs(d_idx - base[..., None]) * 100).astype(np.int32)
    S += rng.integers(0, 120, S.shape).astype(np.int32)
    for uniq, d12 in [(10, 1), (10, 0)]:
        ref = np.asarray(ops.select_disparity(jnp.asarray(S), uniq, d12, 0))
        got = np.asarray(
            ops.select_disparity_hdw(
                jnp.asarray(np.transpose(S, (0, 2, 1))), uniq, d12, 0
            )
        )
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("ndirs", [3, 5, 8])
def test_aggregate(pair, ndirs):
    l, r = pair
    C = oracle.block_cost(
        oracle.bt_cost(
            oracle.clipped_xderiv(l, CAP), oracle.clipped_xderiv(r, CAP), D
        ),
        K,
    )
    got = np.asarray(ops.aggregate(jnp.asarray(C, jnp.int32), P1, P2, ndirs))
    want = oracle.aggregate(C, P1, P2, ndirs)
    np.testing.assert_array_equal(got, want)


def test_select_disparity(pair):
    l, r = pair
    S = oracle.aggregate(
        oracle.block_cost(
            oracle.bt_cost(
                oracle.clipped_xderiv(l, CAP), oracle.clipped_xderiv(r, CAP), D
            ),
            K,
        ),
        P1, P2, 8,
    )
    got = np.asarray(
        ops.select_disparity(jnp.asarray(S, jnp.int32), 10, 1, 0)
    )
    want = oracle.select_disparity(S, 10, 1, 0)
    np.testing.assert_array_equal(got, want)


def test_filter_speckles_matches_floodfill():
    rng = np.random.default_rng(3)
    H, W = 20, 20
    inv = -16
    d = np.full((H, W), inv, np.int16)
    # a few blobs of various sizes and levels
    d[2:5, 2:5] = 160          # 9 px blob
    d[8:18, 3:13] = 320        # 100 px blob
    d[0, 10:14] = 480          # 4 px line
    d[10, 10] = 1000           # level jump inside big blob -> splits it
    noise = rng.integers(0, 2, (H, W)) == 0
    got = np.asarray(
        ops.filter_speckles(jnp.asarray(d), 20, 16 * 2, inv)
    )
    want = oracle.filter_speckles(d, 20, 16 * 2, inv)
    np.testing.assert_array_equal(got, want)


def test_filter_speckles_serpentine_vs_cv2():
    """Adversarial: a boustrophedon snake — one 4-connected component whose
    internal path length (~H*W/2) far exceeds H+W. Min-label propagation
    without pointer jumping cannot converge within the H+W cap and would
    split the snake into sub-threshold pieces, wrongly invalidating a large
    component. Oracle is the real cv2.filterSpeckles."""
    cv2 = pytest.importorskip("cv2")
    H, W = 32, 32
    inv = -16
    d = np.full((H, W), inv, np.int16)
    for y in range(0, H, 2):
        d[y, :] = 160
    for i, y in enumerate(range(1, H - 1, 2)):
        d[y, W - 1 if i % 2 == 0 else 0] = 160
    # snake area = 16*32 + 15 = 527 > 400 -> must be KEPT
    got = np.asarray(ops.filter_speckles(jnp.asarray(d), 400, 16 * 2, inv))
    want_cv = d.copy()
    cv2.filterSpeckles(want_cv, inv, 400, 16 * 2)
    np.testing.assert_array_equal(got, want_cv)
    assert (got != inv).sum() == 527  # the snake survived intact


def test_small_component_mask_matches_scatter():
    """The TPU sort->segment-sum->packed-bit-un-sort path (no
    scatter/gather; validity derived from label == H*W) must equal the
    scatter-add area formulation exactly, including invalid pixels
    grouped in one giant segment."""
    from primestereomatch_tpu.ops.sgbm import _small_component_mask

    rng = np.random.default_rng(5)
    for H, W, nlab, mx in ((24, 40, 6, 100), (37, 129, 500, 9),
                           (16, 256, 1, 3000)):
        labels = jnp.asarray(rng.integers(0, nlab, (H, W)).astype(np.int32))
        valid = jnp.asarray(rng.random((H, W)) > 0.3)
        labels = jnp.where(valid, labels, H * W)
        areas = np.asarray(
            jnp.zeros(H * W + 1, jnp.int32)
            .at[labels.reshape(-1)]
            .add(valid.reshape(-1).astype(jnp.int32))[labels]
        )
        ref = np.asarray(valid) & (areas <= mx)
        got = np.asarray(_small_component_mask(labels, mx))
        np.testing.assert_array_equal(got, ref)


def test_filter_speckles_random_vs_cv2():
    """Cross-validate the repo flood-fill oracle itself against OpenCV on a
    dense random field (many touching components, level jumps)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(7)
    H, W = 48, 64
    inv = -16
    d = (rng.integers(0, 6, (H, W)) * 48).astype(np.int16)
    d[rng.random((H, W)) < 0.3] = inv
    got = np.asarray(ops.filter_speckles(jnp.asarray(d), 24, 16 * 2, inv))
    want_cv = d.copy()
    cv2.filterSpeckles(want_cv, inv, 24, 16 * 2)
    np.testing.assert_array_equal(got, want_cv)
    want_oracle = oracle.filter_speckles(d, 24, 16 * 2, inv)
    np.testing.assert_array_equal(want_oracle, want_cv)


def test_end_to_end_oracle(pair):
    l, r = pair
    cfg = SGBMConfig(
        num_disparities=D, block_size=K, p1=P1, p2=P2,
        speckle_window_size=10, speckle_range=2,
    )
    got = np.asarray(stereo_sgbm_forward(jnp.asarray(l), jnp.asarray(r), cfg))
    lf = oracle.sobel_xclip(l, cfg.pre_filter_cap)
    rf = oracle.sobel_xclip(r, cfg.pre_filter_cap)
    S = oracle.aggregate(
        oracle.block_cost(oracle.bt_cost(lf, rf, D), K), P1, P2, 8
    )
    want = oracle.select_disparity(S, 10, 1, 0)
    want = oracle.filter_speckles(want, 10, 16 * 2, -16)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", ["sgbm", "3way"])
def test_end_to_end_oracle_modes(pair, mode):
    """Full-pipeline bit-exactness for the non-default 'm'-key modes
    (MODE_SGBM / MODE_SGBM_3WAY, src/main.cpp:161-163)."""
    l, r = pair
    cfg = SGBMConfig(
        num_disparities=D, block_size=K, p1=P1, p2=P2,
        speckle_window_size=10, speckle_range=2, mode=mode,
    )
    got = np.asarray(stereo_sgbm_forward(jnp.asarray(l), jnp.asarray(r), cfg))
    lf = oracle.sobel_xclip(l, cfg.pre_filter_cap)
    rf = oracle.sobel_xclip(r, cfg.pre_filter_cap)
    S = oracle.aggregate(
        oracle.block_cost(oracle.bt_cost(lf, rf, D), K), P1, P2,
        cfg.num_directions,
    )
    want = oracle.select_disparity(S, 10, 1, 0)
    want = oracle.filter_speckles(want, 10, 16 * 2, -16)
    np.testing.assert_array_equal(got, want)


def test_sgbm_display_reference_vs_cv2():
    """mode='reference' display conversion must match the reference's exact
    OpenCV sequence (src/StereoMatch.cpp:181-186): minMaxLoc ->
    imgDisparity16S.convertTo(CV_8U, 255/(max-min)) ->
    (lDispMap / 4) * scale_factor on the u8 Mat."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    for sf in (1, 3, 4):
        d16 = rng.integers(-16, 64 * 16, (37, 53)).astype(np.int16)
        got = np.asarray(
            sgbm_display_u8(jnp.asarray(d16), sf, 64, mode="reference")
        )
        minv, maxv, _, _ = cv2.minMaxLoc(d16)
        alpha = 255.0 / (maxv - minv)
        # convertTo(CV_8U, alpha) = saturate_cast<uchar>(cvRound(v*alpha)):
        # cv2.multiply with dtype=CV_8U applies exactly that conversion
        dst = cv2.multiply(d16, np.ones_like(d16), scale=alpha,
                           dtype=cv2.CV_8U)
        dst = cv2.divide(dst, 4)         # rounded u8 division
        dst = cv2.multiply(dst, sf)      # saturating u8 multiply
        np.testing.assert_array_equal(got, np.asarray(dst).reshape(d16.shape))


@pytest.mark.slow
def test_sgbm_quality_teddy(teddy):
    """End-to-end quality: %BP (nonocc, over valid pixels) on Teddy must be
    reasonable for a working SGBM (OpenCV-class results are ~6-12%)."""
    cfg = SGBMConfig()
    disp16 = stereo_sgbm_forward(
        jnp.asarray(teddy.left_bgr), jnp.asarray(teddy.right_bgr), cfg
    )
    disp = np.asarray(sgbm_display_u8(disp16, teddy.scale_factor, cfg.num_disparities))
    valid = np.asarray(disp16) >= 0
    res = bad_pixel_metrics(
        disp, teddy.gt, teddy.scale_factor, cfg.num_disparities,
        mask=teddy.mask_nonocc,
    )
    # %BP over valid (matched) pixels only
    err = res.err_map * valid
    bp_valid = 100.0 * np.count_nonzero(err) / max(valid.sum(), 1)
    density = valid.mean()
    assert density > 0.5, f"disparity density too low: {density:.2f}"
    assert bp_valid < 20.0, f"SGBM %BP(valid,nonocc) too high: {bp_valid:.2f}"


@pytest.mark.parametrize("min_d", [3, 7])
def test_select_disparity_min_disparity(min_d):
    """min_disparity > 0 exercises the scatter frame offset (xr =
    x - (d + minD)), the disp2 value offset, and the shifted minX band —
    hdw must stay bit-exact to the hwd reference and to the oracle."""
    rng = np.random.default_rng(21)
    H, W, D = 20, 96, 16
    S = rng.integers(0, 5000, (H, W, D)).astype(np.int32)
    want = oracle.select_disparity(S.astype(np.int64), 10, 1, min_d)
    got_hwd = np.asarray(ops.select_disparity(jnp.asarray(S), 10, 1, min_d))
    got_hdw = np.asarray(
        ops.select_disparity_hdw(
            jnp.asarray(np.transpose(S, (0, 2, 1))), 10, 1, min_d
        )
    )
    np.testing.assert_array_equal(got_hwd, want)
    np.testing.assert_array_equal(got_hdw, want)


def test_select_disparity_degenerate_tiles():
    """Degenerate selection inputs: a constant-disparity field (range 1)
    and an everything-not-unique field (no scatter candidates at all) —
    edge cases of the range-bounded disp2 walk."""
    H, W, D = 16, 80, 8
    # constant winner at d=3 everywhere, comfortably unique
    d_idx = np.arange(D)[None, None, :]
    S = (np.abs(d_idx - 3) * 1000 + 10).astype(np.int32)
    S = np.broadcast_to(S, (H, W, D)).copy()
    want = oracle.select_disparity(S.astype(np.int64), 10, 1, 0)
    got = np.asarray(
        ops.select_disparity_hdw(jnp.asarray(np.transpose(S, (0, 2, 1))), 10, 1, 0)
    )
    np.testing.assert_array_equal(got, want)
    # flat volume: every far d ties the best cost -> nothing is unique
    S2 = np.full((H, W, D), 100, np.int32)
    want2 = oracle.select_disparity(S2.astype(np.int64), 10, 1, 0)
    got2 = np.asarray(
        ops.select_disparity_hdw(jnp.asarray(np.transpose(S2, (0, 2, 1))), 10, 1, 0)
    )
    np.testing.assert_array_equal(got2, want2)
    assert (np.asarray(got2) == -16).all()
