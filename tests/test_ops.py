"""Per-op equivalence tests against the NumPy/OpenCV oracle of the
reference C++ semantics (tests/oracle.py)."""

import numpy as np
import cv2
import pytest
import jax.numpy as jnp

from primestereomatch_tpu.ops import (
    box_mean,
    resize_nearest,
    resize_bilinear,
    bgr_to_gray_refquirk,
    sobel_x_k1,
    build_cost_volumes,
    wta_disparity,
    fast_guided_filter_color,
    joint_wmf,
    lr_check,
    fill_invalid,
    weighted_median,
)
from primestereomatch_tpu.ops.jointwmf import (
    feature_weight_table,
    from32f_to_32s,
    from32s_to_32f,
    joint_wmf_float,
)

import jax
import oracle


@pytest.mark.parametrize("k", [3, 5, 8, 9, 17])
@pytest.mark.parametrize("engine", ["window", "scan"])
def test_box_mean_matches_cv_blur(rng, k, engine):
    x = rng.random((37, 53), dtype=np.float32)
    want = cv2.blur(x, (k, k))
    got = np.asarray(box_mean(jnp.asarray(x), k, engine=engine))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_box_mean_batched(rng):
    x = rng.random((4, 31, 29), dtype=np.float32)
    got = np.asarray(box_mean(jnp.asarray(x), 5))
    for i in range(4):
        np.testing.assert_allclose(got[i], cv2.blur(x[i], (5, 5)), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("shape,s", [((375, 450), 4), ((375, 450), 2),
                                     ((375, 450), 8), ((370, 463), 4),
                                     ((33, 47), 3)])
def test_resize_nearest_matches_cv(rng, shape, s):
    x = rng.random(shape, dtype=np.float32)
    h, w = shape[0] // s, shape[1] // s
    want = cv2.resize(x, (w, h), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(resize_nearest(jnp.asarray(x), (h, w)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("lo,hi", [((93, 112), (375, 450)), ((46, 56), (375, 450)),
                                   ((17, 23), (53, 71))])
def test_resize_bilinear_matches_cv(rng, lo, hi):
    x = rng.random(lo, dtype=np.float32)
    want = cv2.resize(x, (hi[1], hi[0]), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear(jnp.asarray(x), hi))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gray_sobel_matches_reference_preprocess(teddy):
    img = teddy.left_f32
    want = oracle.preprocess_grad(img)
    gray = bgr_to_gray_refquirk(jnp.asarray(img))
    got = np.asarray(sobel_x_k1(gray))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # reflect-101 zeroes the border gradient
    assert np.abs(got[:, 0]).max() == 0.0
    assert np.abs(got[:, -1]).max() == 0.0


def test_cost_volumes_match_oracle(rng):
    H, W, D = 13, 21, 6
    l_img = rng.random((H, W, 3), dtype=np.float32)
    r_img = rng.random((H, W, 3), dtype=np.float32)
    l_grd = rng.random((H, W), dtype=np.float32)
    r_grd = rng.random((H, W), dtype=np.float32)
    want_l = oracle.build_cost_volume_left(l_img, r_img, l_grd, r_grd, D)
    # reference swaps views for the right volume (DispEst.cpp:215-218)
    want_r = oracle.build_cost_volume_right(r_img, l_img, r_grd, l_grd, D)
    got_l, got_r = build_cost_volumes(
        jnp.asarray(l_img), jnp.asarray(r_img),
        jnp.asarray(l_grd), jnp.asarray(r_grd), D,
    )
    np.testing.assert_allclose(np.asarray(got_l), want_l, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_r), want_r, rtol=1e-6, atol=1e-7)


def test_wta_skips_zero_and_ties_low(rng):
    D, H, W = 8, 5, 7
    cv_ = np.ones((D, H, W), np.float32)
    cv_[0] = -100.0          # d=0 must never win
    cv_[3, 2, 2] = 0.5
    cv_[5, 2, 2] = 0.5       # tie -> lower d wins
    got = np.asarray(wta_disparity(jnp.asarray(cv_)))
    assert got[2, 2] == 3
    assert (got != 0).all()
    want = oracle.wta(cv_)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("s", [1, 2, 4, 8])
def test_fgf_matches_oracle(teddy, s):
    img = teddy.left_f32[:96, :128]
    D = 4
    rng = np.random.default_rng(1)
    p = rng.random((D, 96, 128), dtype=np.float32)
    orc = oracle.FGFColorOracle(img, r=8, eps=1e-4, s=s)
    want = np.stack([orc.filter(p[d]) for d in range(D)])
    got = np.asarray(fast_guided_filter_color(
        jnp.asarray(img), jnp.asarray(p), radius=8, eps=1e-4, subsample=s,
    ))
    # tolerance: box-sum association order differs from cv2.blur; the
    # covariance inverse (division by a small determinant) amplifies ulps.
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_joint_wmf_exact_matches_oracle(teddy, rng):
    guide = teddy.left_bgr[:24, :30]
    disp = rng.integers(0, 16, size=(24, 30), dtype=np.uint8)
    want = oracle.joint_wmf_exact_oracle(disp, guide, r=3, n_bins=16)
    got = np.asarray(joint_wmf(
        jnp.asarray(disp), jnp.asarray(guide), radius=3, n_bins=16,
    ))
    np.testing.assert_array_equal(got, want)


def test_joint_wmf_table_matches_oracle(rng):
    H, W = 22, 26
    disp = rng.integers(0, 16, size=(H, W), dtype=np.uint8)
    findex = rng.integers(0, 32, size=(H, W), dtype=np.int32)
    wmap = feature_weight_table(32, sigma=6.375)
    want = oracle.joint_wmf_oracle(disp, findex, wmap, r=3, n_bins=16)
    got = np.asarray(joint_wmf(
        jnp.asarray(disp), radius=3, n_bins=16,
        findex=jnp.asarray(findex), wmap=jnp.asarray(wmap),
    ))
    np.testing.assert_array_equal(got, want)


def test_grad_offset_opencl_variant(teddy):
    """GIFConfig.grad_offset=0.5 (the OpenCL host's `lGrdX += 0.5`,
    src/CVC_cl.cpp:108-111) must equal manually offsetting the gradients;
    the offset cancels in |gl - gr| so only border-cost columns change."""
    from primestereomatch_tpu.config import GIFConfig
    from primestereomatch_tpu.models.gif_pipeline import _stage_cvc

    l = jnp.asarray(teddy.left_f32[:40, :48])
    r = jnp.asarray(teddy.right_f32[:40, :48])
    cfg0 = GIFConfig(max_dis=16)
    cfg5 = GIFConfig(max_dis=16, grad_offset=0.5)
    lcv0, _ = _stage_cvc(l, r, cfg0)
    lcv5, _ = _stage_cvc(l, r, cfg5)
    # oracle: offset the gradients by hand
    lg = sobel_x_k1(bgr_to_gray_refquirk(l)) + 0.5
    rg = sobel_x_k1(bgr_to_gray_refquirk(r)) + 0.5
    want_l, _ = build_cost_volumes(l, r, lg, rg, 16)
    # jit fuses (g+0.5)-(g2+0.5) with FMA contraction: last-ulp only
    np.testing.assert_allclose(np.asarray(lcv5), np.asarray(want_l), atol=1e-6)
    # interior (non-border-masked) costs are unchanged: |Δg| cancels the offset
    d = np.arange(16)[:, None, None]
    x = np.arange(48)[None, None, :]
    interior = np.broadcast_to(x >= d, lcv0.shape)
    np.testing.assert_allclose(
        np.asarray(lcv5)[interior], np.asarray(lcv0)[interior], atol=1e-6
    )
    assert not np.allclose(np.asarray(lcv5)[~interior], np.asarray(lcv0)[~interior])


def _from32f_oracle(img: np.ndarray, n_levels: int):
    """Linear-walk oracle of the reference's from32FTo32S
    (include/JointWMF.h:670-745): element-by-element greedy clustering,
    structurally unlike the library's searchsorted boundary chain."""
    flat = img.astype(np.float32).ravel()
    order = np.argsort(flat, kind="stable")
    v = flat[order]
    minv = np.float32(v[0])
    max_range = np.float32(v[-1] - minv)

    def count_ok(m):
        base, cnt = minv, 0
        for x in v:
            if x > np.float32(base + m):
                cnt += 1
                base = x
                if cnt == n_levels:
                    return False
        return True

    lo, hi = np.float32(0), np.float32(max_range * np.float32(2.0) / np.float32(n_levels))
    while hi - lo > np.float32(1e-5):
        m = np.float32((hi + lo) * np.float32(0.5))
        if count_ok(m):
            hi = m
        else:
            lo = m

    mapping = np.zeros(n_levels, np.float32)
    idx_sorted = np.zeros(v.size, np.int64)
    base, base_i, cnt = minv, 0, 0
    for i in range(v.size + 1):
        if i == v.size or v[i] > np.float32(base + hi):
            mapping[cnt] = v[(base_i + i - 1) >> 1]
            if i == v.size:
                break
            cnt += 1
            base, base_i = v[i], i
        idx_sorted[i] = cnt
    idx = np.zeros(v.size, np.int32)
    idx[order] = idx_sorted
    return idx.reshape(img.shape), mapping, cnt + 1


@pytest.mark.parametrize("n_levels", [8, 64])
def test_from32f_quantization_matches_reference_walk(rng, n_levels):
    img = (rng.random((40, 50), dtype=np.float32) * 63.0) ** 1.5
    idx, mapping, n_used = from32f_to_32s(img, n_levels)
    widx, wmap_, wn = _from32f_oracle(img, n_levels)
    assert n_used == wn
    np.testing.assert_array_equal(idx, widx)
    np.testing.assert_array_equal(mapping[:n_used], wmap_[:wn])
    # round trip: quantization error bounded by the found bound (<= 2*range/nI)
    rt = from32s_to_32f(idx, mapping)
    bound = 2.0 * (img.max() - img.min()) / n_levels + 1e-5
    assert np.abs(rt - img).max() <= bound


def test_from32f_constant_image(rng):
    img = np.full((9, 11), 3.25, np.float32)
    idx, mapping, n_used = from32f_to_32s(img, 16)
    assert n_used == 1 and np.all(idx == 0) and mapping[0] == np.float32(3.25)


def test_joint_wmf_float_roundtrip(teddy, rng):
    """Float path == uint8 path when the float input is already integral
    (every distinct value gets its own level, mapping is the identity)."""
    guide = teddy.left_bgr[:24, :30]
    disp = rng.integers(0, 16, size=(24, 30), dtype=np.uint8)
    want = np.asarray(joint_wmf(
        jnp.asarray(disp), jnp.asarray(guide), radius=3, n_bins=16,
    ))
    got = np.asarray(joint_wmf_float(
        disp.astype(np.float32), jnp.asarray(guide), radius=3, n_levels=16,
    ))
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_joint_wmf_float_rejects_tracing():
    with pytest.raises(TypeError, match="eagerly"):
        jax.jit(lambda d: joint_wmf_float(d, jnp.zeros((4, 4, 3), jnp.uint8)))(
            jnp.zeros((4, 4), jnp.float32)
        )


def test_lr_check_matches_oracle(rng):
    H, W = 17, 33
    ld = rng.integers(0, 16, size=(H, W), dtype=np.uint8)
    rd = rng.integers(0, 16, size=(H, W), dtype=np.uint8)
    want_l, want_r = oracle.lr_check_oracle(ld, rd)
    got_l, got_r = lr_check(jnp.asarray(ld), jnp.asarray(rd))
    np.testing.assert_array_equal(np.asarray(got_l), want_l)
    np.testing.assert_array_equal(np.asarray(got_r), want_r)


def test_fill_invalid_matches_oracle(rng):
    H, W = 11, 29
    dis = rng.integers(0, 16, size=(H, W), dtype=np.uint8)
    valid = (rng.random((H, W)) < 0.6).astype(np.uint8)
    valid[3] = 0   # a fully-invalid row
    want = oracle.fill_inv_oracle(dis, valid)
    got = np.asarray(fill_invalid(jnp.asarray(dis), jnp.asarray(valid)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_sqrt", [False, True])
def test_weighted_median_matches_oracle(teddy, rng, use_sqrt):
    H, W = 16, 18
    img = teddy.left_f32[:H, :W]
    dis = rng.integers(0, 12, size=(H, W), dtype=np.uint8)
    valid = (rng.random((H, W)) < 0.5).astype(np.uint8)
    want = oracle.wgt_median_oracle(img, dis, valid, max_dis=12, med_sz=7,
                                    use_sqrt=use_sqrt)
    got = np.asarray(weighted_median(
        jnp.asarray(img), jnp.asarray(dis), jnp.asarray(valid),
        max_dis=12, med_sz=7, use_sqrt=use_sqrt,
    ))
    np.testing.assert_array_equal(got, want)


class TestFeatureIndexing:
    """'table'-mode WMF clustering (utils/features.py) mirrors the
    reference featureIndexing contract (include/JointWMF.h:494-660)."""

    def test_few_unique_colors_lossless(self, rng):
        import jax.numpy as jnp
        from primestereomatch_tpu.utils.features import feature_index_color
        from primestereomatch_tpu.ops.jointwmf import joint_wmf

        # guide with <= n_feat unique colors: clustering is lossless. The
        # weight VALUES still come from different paths (numpy f64 exp
        # table vs on-device f32 exp), so knife-edge median ties may flip
        # on a handful of pixels — assert near-exactness, not bitwise.
        local = np.random.default_rng(42)
        palette = local.integers(0, 256, (8, 3), dtype=np.uint8)
        pick = local.integers(0, 8, (32, 40))
        guide = palette[pick]
        disp = jnp.asarray(local.integers(0, 16, (32, 40), dtype=np.uint8))
        fi, wm = feature_index_color(guide, n_feat=256)
        out_t = np.asarray(joint_wmf(
            disp, radius=4, n_bins=16,
            findex=jnp.asarray(fi), wmap=jnp.asarray(wm),
        ))
        out_e = np.asarray(joint_wmf(disp, jnp.asarray(guide), radius=4, n_bins=16))
        assert (out_t != out_e).mean() <= 2e-3

    def test_clustered_close_to_exact(self, rng, teddy):
        import jax.numpy as jnp
        from primestereomatch_tpu.utils.features import feature_index_color
        from primestereomatch_tpu.ops.jointwmf import joint_wmf

        crop = teddy.left_bgr[100:164, 100:164]
        fi, wm = feature_index_color(crop, n_feat=256)
        disp = jnp.asarray(rng.integers(0, 16, (64, 64), dtype=np.uint8))
        out_t = np.asarray(joint_wmf(
            disp, radius=5, n_bins=16,
            findex=jnp.asarray(fi), wmap=jnp.asarray(wm),
        ))
        out_e = np.asarray(joint_wmf(disp, jnp.asarray(crop), radius=5, n_bins=16))
        # clustering is the reference's approximation; most pixels agree
        assert (out_t != out_e).mean() < 0.15

    def test_gray_weight_ops(self):
        from primestereomatch_tpu.utils.features import feature_index_gray

        for op in ("exp", "iv1", "iv2", "cos", "jac", "off"):
            w = feature_index_gray(weight_type=op)
            assert w.shape == (256, 256)
            assert np.all(np.isfinite(w))
            np.testing.assert_allclose(w, w.T)


class TestU8CostVolume:
    """Quantized uchar CVC variant (assets/cvc.cl:42-126 semantics)."""

    def test_matches_cl_oracle(self, rng):
        """Bit-exact vs a direct NumPy transcription of cvc_uchar_vx's LR
        loop math (integer /3, TAU_US clamps, float mul, uchar trunc)."""
        from primestereomatch_tpu.ops.cost_volume import build_cost_volumes_u8

        H, W, D = 14, 26, 6
        l = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        r = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        lg = rng.integers(0, 256, (H, W), dtype=np.uint8)
        rg = rng.integers(0, 256, (H, W), dtype=np.uint8)
        lcv, rcv = build_cost_volumes_u8(
            jnp.asarray(l), jnp.asarray(r), jnp.asarray(lg), jnp.asarray(rg), D
        )
        assert lcv.dtype == jnp.uint8 and rcv.dtype == jnp.uint8

        def cost(a, b, ag, bg):
            clr = (
                abs(int(a[0]) - int(b[0]))
                + abs(int(a[1]) - int(b[1]))
                + abs(int(a[2]) - int(b[2]))
            ) // 3
            grd = abs(int(ag) - int(bg))
            clr = min(clr, 1835)
            grd = min(grd, 524)
            return np.uint8(np.float32(0.9) * np.float32(clr)
                            + np.float32(1.0 - 0.9) * np.float32(grd))

        lcv_np = np.asarray(lcv)
        rcv_np = np.asarray(rcv)
        B = (255, 255, 255)
        for d in (0, 1, 5):
            for y in (0, 7, H - 1):
                for x in (0, 1, d, W - d - 1, W - 1):
                    if x - d >= 0:
                        want = cost(l[y, x], r[y, x - d], lg[y, x], rg[y, x - d])
                    else:
                        want = cost(l[y, x], B, lg[y, x], 255)
                    assert lcv_np[d, y, x] == want, (d, y, x)
                    if x + d < W:
                        want = cost(r[y, x], l[y, x + d], rg[y, x], lg[y, x + d])
                    else:
                        want = cost(r[y, x], B, rg[y, x], 255)
                    assert rcv_np[d, y, x] == want, (d, y, x)

    def test_u8_gray_sobel_match_cv2(self, rng):
        """u8 prep equals OpenCV's fixed-point cvtColor + CV_8U Sobel."""
        cv2 = pytest.importorskip("cv2")
        from primestereomatch_tpu.ops.color import (
            bgr_to_gray_refquirk_u8,
            sobel_x_k1_u8,
        )

        img = rng.integers(0, 256, (20, 33, 3), dtype=np.uint8)
        # the reference feeds BGR data to an RGB2GRAY conversion. This
        # repo implements the classic 14-bit fixed-point round-half-up
        # cvtColor math; cv2 builds with IPP dispatch round a fraction of
        # pixels one ulp differently — allow that
        want_gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        got_gray = np.asarray(bgr_to_gray_refquirk_u8(jnp.asarray(img)))
        diff = np.abs(got_gray.astype(int) - want_gray.astype(int))
        assert diff.max() <= 1 and (diff != 0).mean() <= 0.01
        want_grad = cv2.Sobel(want_gray, cv2.CV_8U, 1, 0, ksize=1)
        got_grad = np.asarray(sobel_x_k1_u8(jnp.asarray(want_gray)))
        np.testing.assert_array_equal(got_grad, want_grad)

    def test_pipeline_u8_variant(self, teddy):
        """cvc_dtype='u8' runs end-to-end and produces a sane disparity
        (quantized costs shift knife-edge argmins, so quality is close to
        but not equal to the f32 golden path)."""
        from primestereomatch_tpu.config import GIFConfig
        from primestereomatch_tpu.models.gif_pipeline import stereo_gif_forward
        from primestereomatch_tpu.utils.eval import bad_pixel_metrics

        cfg = GIFConfig(cvc_dtype="u8")
        ld, _ = stereo_gif_forward(
            jnp.asarray(teddy.left_f32), jnp.asarray(teddy.right_f32), cfg
        )
        res = bad_pixel_metrics(
            np.asarray(ld), teddy.gt, teddy.scale_factor, 64,
            mask=teddy.mask_nonocc,
        )
        assert res.percent_bad_pixels < 25.0  # f32 golden path: ~17.2
