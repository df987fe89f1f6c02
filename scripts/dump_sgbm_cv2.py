"""Mint end-to-end SGBM goldens from the REAL cv::StereoSGBM.

The reference's STEREO_SGBM component IS OpenCV's implementation
(src/StereoMatch.cpp:180 `ssgbm->compute(...)`, parameter set
src/StereoMatch.cpp:639-660). The rebuild validates against its own
NumPy oracle (tests/oracle_sgbm.py), which documents two deliberate
deltas from OpenCV (replicate-border window sums; gather-based right
disparity). This script quantifies them: it runs cv2.StereoSGBM with the
reference parameters on Teddy, Cones, Art and Dolls in all three modes
and writes the raw int16 disparity maps to tests/golden/sgbm_cv2.npz,
which tests/test_sgbm_cv2_golden.py pins against stereo_sgbm_forward.

Run from the repo root: python scripts/dump_sgbm_cv2.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import cv2

from primestereomatch_tpu.utils.datasets import load_dataset

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden"

MODES = {
    "hh": cv2.StereoSGBM_MODE_HH,
    "sgbm": cv2.StereoSGBM_MODE_SGBM,
    "3way": cv2.StereoSGBM_MODE_SGBM_3WAY,
}


def main() -> None:
    arrays = {}
    for name in ("Teddy", "Cones", "Art", "Dolls"):
        ds = load_dataset(name)
        l_bgr = np.asarray(ds.left_bgr)
        r_bgr = np.asarray(ds.right_bgr)
        ch = l_bgr.shape[-1]
        for mode, cv_mode in MODES.items():
            # the exact reference parameter set, src/StereoMatch.cpp:645-657
            sgbm = cv2.StereoSGBM_create(
                minDisparity=0,
                numDisparities=64,
                blockSize=5,
                P1=8 * ch * 5 * 5,
                P2=32 * ch * 5 * 5,
                disp12MaxDiff=1,
                preFilterCap=63,
                uniquenessRatio=10,
                speckleWindowSize=100,
                speckleRange=32,
                mode=cv_mode,
            )
            d16 = sgbm.compute(l_bgr, r_bgr)
            arrays[f"{name}_{mode}"] = d16.astype(np.int16)
            print(f"{name} {mode}: dtype={d16.dtype} "
                  f"range=[{d16.min()}, {d16.max()}] "
                  f"invalid={float((d16 < 0).mean()):.3f}")
    OUT.mkdir(exist_ok=True)
    np.savez_compressed(OUT / "sgbm_cv2.npz", **arrays)
    print(f"wrote {OUT / 'sgbm_cv2.npz'} "
          f"({(OUT / 'sgbm_cv2.npz').stat().st_size} bytes, cv2 "
          f"{cv2.__version__})")


if __name__ == "__main__":
    main()
