"""Per-stage regression against artifacts produced by the ACTUAL reference
CPU code.

scripts/refdump compiles the reference's unmodified stage files
(/root/reference/src/{CVC,fastguidedfilter,DispSel,PP}.cpp +
include/JointWMF.h, with a stub CL/cl.h) and drives them in the DispEst
golden-path order (src/DispEst.cpp:199-344) on Teddy/Cones. The dumps live
in tests/golden/ref_{teddy,cones}.npz + ref_*_metrics.json; this file pins
our pipeline against that reference-binary truth:

  grdx / CVC  — last-ulp float agreement (identical arithmetic)
  CVF (FGF)   — <= 1e-3 absolute (cv::blur running sums + cv::resize
                bilinear vs our cumsum boxfilter + fused upsample: same
                math, different float summation order)
  WTA         — <= 0.05%% of pixels differ (knife-edge cost ties)
  PP (final)  — mean |diff| <= 0.3 disparity levels and mismatch <= 10%%.
                The PP stage cannot be bitwise: the reference's JointWMF
                clusters guide colors with cv::kmeans (randomized k-means++
                seeding, include/JointWMF.h:590) so even two reference runs
                need not agree; our 'exact' mode uses the un-clustered
                6-bit-quantized color weights directly.
  %%BP        — within 0.15 of the reference binary on every mask mode.
"""

import json
import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from primestereomatch_tpu.config import GIFConfig
from primestereomatch_tpu.models import stereo_gif_forward
from primestereomatch_tpu.models.gif_pipeline import DispEst
from primestereomatch_tpu.ops.color import bgr_to_gray_refquirk, sobel_x_k1
from primestereomatch_tpu.utils import load_dataset, bad_pixel_metrics

GOLDEN = pathlib.Path(__file__).parent / "golden"
PROBE_D = [1, 8, 32, 63]


@pytest.fixture(scope="module")
def teddy_ref():
    return np.load(GOLDEN / "ref_teddy.npz")


@pytest.fixture(scope="module")
def teddy():
    return load_dataset("Teddy")


@pytest.mark.slow
def test_cvc_stage_matches_reference(teddy, teddy_ref):
    li = jnp.asarray(teddy.left_f32)
    ri = jnp.asarray(teddy.right_f32)
    lg = np.asarray(sobel_x_k1(bgr_to_gray_refquirk(li)))
    rg = np.asarray(sobel_x_k1(bgr_to_gray_refquirk(ri)))
    np.testing.assert_allclose(lg, teddy_ref["lgrdx"], atol=5e-7)
    np.testing.assert_allclose(rg, teddy_ref["rgrdx"], atol=5e-7)
    lcv, rcv = DispEst(GIFConfig()).cost_const(li, ri)
    for d in PROBE_D:
        np.testing.assert_allclose(
            np.asarray(lcv[d]), teddy_ref[f"cvc_l_d{d}"], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(rcv[d]), teddy_ref[f"cvc_r_d{d}"], atol=1e-6
        )


@pytest.mark.slow
def test_cvf_stage_matches_reference(teddy, teddy_ref):
    li = jnp.asarray(teddy.left_f32)
    ri = jnp.asarray(teddy.right_f32)
    eng = DispEst(GIFConfig())
    lcv, rcv = eng.cost_const(li, ri)
    lcvf = np.asarray(eng.cost_filter(li, lcv))
    rcvf = np.asarray(eng.cost_filter(ri, rcv))
    for d in PROBE_D:
        np.testing.assert_allclose(lcvf[d], teddy_ref[f"cvf_l_d{d}"], atol=1e-3)
        np.testing.assert_allclose(rcvf[d], teddy_ref[f"cvf_r_d{d}"], atol=1e-3)


@pytest.mark.slow
def test_wta_stage_matches_reference(teddy, teddy_ref):
    li = jnp.asarray(teddy.left_f32)
    ri = jnp.asarray(teddy.right_f32)
    ld, rd = stereo_gif_forward(li, ri, GIFConfig(), run_postprocess=False)
    lm = (np.asarray(ld) != teddy_ref["ldisp_wta"]).mean()
    rm = (np.asarray(rd) != teddy_ref["rdisp_wta"]).mean()
    assert lm <= 5e-4, f"left WTA mismatch {lm:.2%}"
    assert rm <= 5e-4, f"right WTA mismatch {rm:.2%}"


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,pre",
    [
        # 2003 sets: im2/im6, x4 GT, occl + disc masks
        ("Teddy", "teddy"), ("Cones", "cones"),
        # 2005 sets: view1/view5, x3 GT, no masks
        # (/root/reference/src/StereoMatch.cpp:541-554)
        ("Art", "art"), ("Books", "books"), ("Dolls", "dolls"),
        ("Laundry", "laundry"), ("Moebius", "moebius"),
        ("Reindeer", "reindeer"),
    ],
)
def test_final_disparity_and_bp_match_reference(name, pre):
    ref = np.load(GOLDEN / f"ref_{pre}.npz")
    metrics = json.loads((GOLDEN / f"ref_{pre}_metrics.json").read_text())
    s = load_dataset(name)
    cfg = GIFConfig()
    li, ri = jnp.asarray(s.left_f32), jnp.asarray(s.right_f32)
    ld, rd = stereo_gif_forward(li, ri, cfg)
    # WTA (pre-PP) stage is deterministic in the reference: tight bound
    ldw, rdw = stereo_gif_forward(li, ri, cfg, run_postprocess=False)
    for got, key in [(np.asarray(ldw), "ldisp_wta"), (np.asarray(rdw), "rdisp_wta")]:
        mm = (got != ref[key]).mean()
        assert mm <= 5e-4, f"{key} mismatch {mm:.2%} (knife-edge tie budget)"
    for got, key in [(np.asarray(ld), "ldisp_pp"), (np.asarray(rd), "rdisp_pp")]:
        diff = np.abs(got.astype(np.int32) - ref[key].astype(np.int32))
        assert diff.mean() <= 0.3, f"{key} mean |diff| {diff.mean():.3f}"
        assert (diff > 0).mean() <= 0.10, f"{key} mismatch {(diff > 0).mean():.2%}"
    masks = {
        "none": (None, False),
        "nonocc": (s.mask_nonocc, False),
        "disc": (s.mask_disc, True),
    }
    for mode, (mask, is_disc) in masks.items():
        if mode not in metrics:
            continue  # 2005 sets ship no masks
        got = bad_pixel_metrics(
            np.asarray(ld), s.gt, s.scale_factor, cfg.max_dis,
            mask=mask, mask_is_disc=is_disc,
        )
        want = metrics[mode]["pbp"]
        assert got.percent_bad_pixels == pytest.approx(want, abs=0.15), mode
