"""End-to-end SGBM goldens vs the REAL cv::StereoSGBM.

The reference's STEREO_SGBM component is OpenCV's implementation
(src/StereoMatch.cpp:180, parameters :639-660). These tests pin
`stereo_sgbm_forward` against raw cv2.StereoSGBM int16 outputs minted by
scripts/dump_sgbm_cv2.py (tests/golden/sgbm_cv2.npz, cv2 5.0.0) for
Teddy, Cones, Art and Dolls in all three modes.

Round 5 closed the round-4 semantic gaps: the prefilter is now the
[1,2,1]-smoothed clipped Sobel-x cv2 uses (ops/sgbm.py::sobel_xclip),
sub-pixel refinement is OpenCV's truncating integer formula, the LR
check is the scatter-based pseudo right disparity with the floor/ceil
dual lookup, and the left minX band is invalidated outright. The one
remaining documented delta is replicate-border WINDOW sums (block cost)
vs OpenCV's row-buffer border math — it accounts for the residual
non-exact pixels (the sub-pixel parabola shifts by a few /16 steps and
knife-edge uniqueness/LR decisions flip near texture-poor regions).

Measured at pin time (exact16 / within-1d on jointly-valid x>=64 /
validity mismatch x>=64 / %BP ours vs cv2; band validity mismatch is 0
everywhere):
  Teddy hh   0.6155 / 0.9944 / 0.035 / 11.83 vs 11.28
  Teddy sgbm 0.6002 / 0.9919 / 0.031 / 11.24 vs 10.96
  Teddy 3way 0.5767 / 0.9882 / 0.032 / 10.70 vs 10.40
  Cones hh   0.6470 / 0.9954 / 0.027 /  5.86 vs  5.15
  Cones sgbm 0.6429 / 0.9952 / 0.029 /  5.83 vs  5.09
  Cones 3way 0.6276 / 0.9938 / 0.029 /  5.71 vs  5.03
  Art  worst 0.5803 / 0.9794 / 0.092
  Dolls worst 0.6113 / 0.9917 / 0.053
"""

import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from primestereomatch_tpu.config import SGBMConfig
from primestereomatch_tpu.models.sgbm_pipeline import stereo_sgbm_forward
from primestereomatch_tpu.utils.datasets import load_dataset
from primestereomatch_tpu.utils.eval import bad_pixel_metrics

GOLDEN = pathlib.Path(__file__).parent / "golden" / "sgbm_cv2.npz"
ND = 64  # numDisparities (reference setting)


@pytest.fixture(scope="module")
def cv2_goldens():
    return np.load(GOLDEN)


# per-set pins (measured + slack): the 2005 sets (Art/Dolls) carry more
# texture-poor area where knife-edge uniqueness/validity decisions
# diverge, so their bounds are looser; measured at pin time (within-1d
# on jointly-valid x>=64 / interior validity mismatch, worst mode):
#   Teddy 0.9882/0.035  Cones 0.9938/0.029
#   Art   0.9794/0.092  Dolls 0.9917/0.053
BOUNDS = {
    "Teddy": (0.985, 0.045),
    "Cones": (0.990, 0.040),
    "Art": (0.975, 0.110),
    "Dolls": (0.988, 0.065),
}


@pytest.mark.parametrize("name", ["Teddy", "Cones", "Art", "Dolls"])
@pytest.mark.parametrize("mode", ["hh", "sgbm", "3way"])
def test_sgbm_matches_cv2(cv2_goldens, name, mode):
    ds = load_dataset(name)
    ours = np.asarray(stereo_sgbm_forward(
        jnp.asarray(ds.left_bgr), jnp.asarray(ds.right_bgr),
        SGBMConfig(mode=mode),
    ))
    ref = cv2_goldens[f"{name}_{mode}"]
    assert ours.shape == ref.shape and ours.dtype == ref.dtype

    interior_o = ours[:, ND:]
    interior_r = ref[:, ND:]
    both = (interior_o >= 0) & (interior_r >= 0)
    assert both.mean() > 0.5
    diff = np.abs(interior_o.astype(np.int32) - interior_r.astype(np.int32))
    within_1d = float((diff[both] <= 16).mean())
    w1_min, vm_max = BOUNDS[name]
    assert within_1d >= w1_min, f"within-1-disparity agreement {within_1d:.4f}"

    validity_mm = float(((interior_o >= 0) != (interior_r >= 0)).mean())
    assert validity_mm <= vm_max, f"interior validity mismatch {validity_mm:.4f}"

    # left band: minX invalidation now matches OpenCV exactly
    band_mm = float(((ours[:, :ND] >= 0) != (ref[:, :ND] >= 0)).mean())
    assert band_mm == 0.0, f"left-band validity mismatch {band_mm:.3f}"

    if ds.mask_nonocc is None:
        return  # 2005 sets: no nonocc mask; %BP pinned on Teddy/Cones

    def bp(d16):
        u8 = np.clip(np.maximum(d16.astype(np.int32), 0) // 16, 0, ND - 1)
        return bad_pixel_metrics(
            u8.astype(np.uint8), ds.gt, ds.scale_factor, ND,
            mask=ds.mask_nonocc,
        ).percent_bad_pixels

    bp_ours, bp_cv2 = bp(ours), bp(ref)
    assert abs(bp_ours - bp_cv2) <= 1.0, f"%BP {bp_ours:.2f} vs cv2 {bp_cv2:.2f}"


def test_cv2_goldens_are_fresh():
    """Goldens must reproduce from the in-env cv2 (guards against a stale
    npz after an OpenCV upgrade). Only 'hh' to keep it quick."""
    cv2 = pytest.importorskip("cv2")
    ds = load_dataset("Teddy")
    sgbm = cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=ND, blockSize=5,
        P1=8 * 3 * 25, P2=32 * 3 * 25, disp12MaxDiff=1, preFilterCap=63,
        uniquenessRatio=10, speckleWindowSize=100, speckleRange=32,
        mode=cv2.StereoSGBM_MODE_HH,
    )
    d16 = sgbm.compute(np.asarray(ds.left_bgr), np.asarray(ds.right_bgr))
    ref = np.load(GOLDEN)["Teddy_hh"]
    np.testing.assert_array_equal(d16.astype(np.int16), ref)
