"""End-to-end golden regression: STEREO_GIF %BP on Middlebury.

The reference has no tests; its de-facto acceptance oracle is the live %BP
printout (src/StereoMatch.cpp:275-311, SURVEY.md §4). These values were
produced by the ACTUAL reference CPU binary (scripts/refdump compiles the
reference's unmodified CVC.cpp/fastguidedfilter.cpp/DispSel.cpp/PP.cpp and
runs the golden path; artifacts in tests/golden/ref_*_metrics.json).
Tolerance covers backend (CPU vs TPU) ulp differences plus the documented
PP-stage delta (our 'exact' WMF weights vs the reference's randomized
k-means clustering — see tests/test_reference_golden.py, mean |diff|
~0.15 disparity levels, %BP within 0.08).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from primestereomatch_tpu.config import GIFConfig
from primestereomatch_tpu.models import stereo_gif_forward
from primestereomatch_tpu.utils import load_dataset, bad_pixel_metrics

# reference-binary truth (tests/golden/ref_*_metrics.json)
GOLDEN_NONOCC = {
    "Teddy": 17.229,
    "Cones": 9.072,
}


@pytest.mark.slow
@pytest.mark.parametrize("name", ["Teddy", "Cones"])
def test_gif_golden_bp(name):
    s = load_dataset(name)
    cfg = GIFConfig()
    ld, rd = stereo_gif_forward(
        jnp.asarray(s.left_f32), jnp.asarray(s.right_f32), cfg
    )
    res = bad_pixel_metrics(
        np.asarray(ld), s.gt, s.scale_factor, cfg.max_dis, mask=s.mask_nonocc
    )
    assert res.percent_bad_pixels == pytest.approx(GOLDEN_NONOCC[name], abs=0.3)
    # right map sanity: same scene, same ballpark of valid disparities
    assert np.asarray(rd).max() < cfg.max_dis
    assert np.asarray(ld).min() >= 0


@pytest.mark.slow
def test_gif_no_postprocess_runs():
    s = load_dataset("Teddy")
    cfg = GIFConfig()
    ld, _ = stereo_gif_forward(
        jnp.asarray(s.left_f32), jnp.asarray(s.right_f32), cfg,
        run_postprocess=False,
    )
    ld = np.asarray(ld)
    assert ld.shape == s.gt.shape
    assert ld.min() >= 1  # WTA never selects disparity 0
