"""Calibration/rectification: the golden oracle is data/extrinsics.yml —
R1/R2/P1/P2/Q computed by the upstream toolchain (OpenCV stereoRectify,
alpha=1, CALIB_ZERO_DISPARITY, src/StereoMatch.cpp:456-458) from the
M/D/R/T in data/intrinsics.yml at the ZED HD720 per-eye size 1280x720."""

import numpy as np
import jax.numpy as jnp
import pytest

from primestereomatch_tpu.calib import (
    Rectifier,
    distort_points,
    init_undistort_rectify_map,
    load_stereo_calibration,
    read_opencv_yml,
    stereo_rectify,
    undistort_points,
    write_opencv_yml,
)
from primestereomatch_tpu.calib.distortion import rodrigues
from primestereomatch_tpu.ops.remap import remap_bilinear
from primestereomatch_tpu.utils.datasets import data_root

IMG_SIZE = (1280, 720)  # the shipped YMLs were calibrated at ZED HD720 per eye
# (M1 principal point ~(673, 370) only makes sense on a 1280x720 sensor;
# the reference app nevertheless applies them at its runtime frame size,
# src/StereoMatch.cpp:456 — a data quirk of the reference, not replicated here)


@pytest.fixture(scope="module")
def calib():
    root = data_root()
    return load_stereo_calibration(
        str(root / "intrinsics.yml"), str(root / "extrinsics.yml")
    )


def test_yml_reader(calib):
    assert calib["M1"].shape == (3, 3)
    assert calib["D1"].shape == (1, 14)
    assert calib["R"].shape == (3, 3)
    assert calib["T"].shape == (3, 1)
    np.testing.assert_allclose(calib["M1"][0, 0], 703.39557117042818)


def test_yml_roundtrip(tmp_path, calib):
    p = str(tmp_path / "roundtrip.yml")
    write_opencv_yml(p, {"M1": calib["M1"], "D1": calib["D1"], "n": 3})
    back = read_opencv_yml(p)
    np.testing.assert_array_equal(back["M1"], calib["M1"])
    np.testing.assert_array_equal(back["D1"], calib["D1"])
    assert back["n"] == 3


def test_rodrigues_roundtrip(rng):
    for _ in range(10):
        v = rng.normal(size=3) * 0.8
        R = rodrigues(v)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(rodrigues(R), v, atol=1e-9)


def test_distort_undistort_roundtrip(calib):
    rng = np.random.default_rng(0)
    A = calib["M1"]
    D = calib["D1"]
    xy = rng.uniform(-0.3, 0.3, (100, 2))
    d = distort_points(xy, D)
    uv = np.stack([A[0, 0] * d[..., 0] + A[0, 2], A[1, 1] * d[..., 1] + A[1, 2]], -1)
    back = undistort_points(uv, A, D)
    np.testing.assert_allclose(back, xy, atol=2e-5)


def test_stereo_rectify_matches_golden(calib):
    rect = stereo_rectify(
        calib["M1"], calib["D1"], calib["M2"], calib["D2"],
        IMG_SIZE, calib["R"], calib["T"], alpha=1.0,
    )
    np.testing.assert_allclose(rect.R1, calib["R1"], atol=1e-8)
    np.testing.assert_allclose(rect.R2, calib["R2"], atol=1e-8)
    # residual ~4e-5 relative: the upstream toolchain samples the corner/grid
    # points in float32; the geometry itself matches
    np.testing.assert_allclose(rect.P1, calib["P1"], rtol=3e-4, atol=0.15)
    np.testing.assert_allclose(rect.P2, calib["P2"], rtol=3e-4, atol=0.15)
    np.testing.assert_allclose(rect.Q, calib["Q"], rtol=3e-4, atol=0.15)


def test_rectified_epipolar_alignment(calib):
    """A world point projected into both raw cameras must land on the same
    row after undistort+rectify — the whole point of rectification."""
    rng = np.random.default_rng(1)
    rect = stereo_rectify(
        calib["M1"], calib["D1"], calib["M2"], calib["D2"],
        IMG_SIZE, calib["R"], calib["T"], alpha=1.0,
    )
    R = calib["R"]
    T = calib["T"].reshape(3)
    pts_w = rng.uniform([-1, -1, 3], [1, 1, 8], (50, 3))  # in left-cam frame

    def project(A, D, X):
        xy = X[..., :2] / X[..., 2:3]
        d = distort_points(xy, D)
        return np.stack(
            [A[0, 0] * d[..., 0] + A[0, 2], A[1, 1] * d[..., 1] + A[1, 2]], -1
        )

    # OpenCV extrinsics convention: x_right = R @ x_left + T
    uv1 = project(calib["M1"], calib["D1"], pts_w)
    uv2 = project(calib["M2"], calib["D2"], pts_w @ R.T + T)
    # iterations=40: fully converge the inverse model (the 5-iteration
    # default matches the golden files' toolchain but leaves ~0.3 px
    # residual at the frame edges)
    r1 = undistort_points(uv1, calib["M1"], calib["D1"], R=rect.R1, P=rect.P1,
                          iterations=40)
    r2 = undistort_points(uv2, calib["M2"], calib["D2"], R=rect.R2, P=rect.P2,
                          iterations=40)
    np.testing.assert_allclose(r1[:, 1], r2[:, 1], atol=0.05)  # rows align
    assert np.all(r1[:, 0] - r2[:, 0] > 0)  # positive disparity


def test_remap_identity_and_shift(rng):
    img = jnp.asarray(rng.random((10, 12, 3), dtype=np.float32))
    gy, gx = np.mgrid[0:10, 0:12].astype(np.float32)
    ident = jnp.asarray(np.stack([gx, gy], axis=-1))
    np.testing.assert_allclose(np.asarray(remap_bilinear(img, ident)), np.asarray(img))

    half = jnp.asarray(np.stack([gx + 0.5, gy], axis=-1))
    out = np.asarray(remap_bilinear(img, half))
    want = 0.5 * (np.asarray(img)[:, :-1] + np.asarray(img)[:, 1:])
    np.testing.assert_allclose(out[:, :-1], want, atol=1e-6)
    # last column samples x=11.5 -> half outside -> half intensity
    np.testing.assert_allclose(out[:, -1], 0.5 * np.asarray(img)[:, -1], atol=1e-6)


def test_rectifier_end_to_end(calib, rng):
    rec = Rectifier(calib, IMG_SIZE)
    w, h = IMG_SIZE
    l = jnp.asarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    lr, rr = rec(l, r)
    assert lr.shape == rr.shape
    x0, y0, x1, y1 = rec.crop
    assert lr.shape == (y1 - y0, x1 - x0, 3)
    assert lr.dtype == jnp.uint8
    assert 0 < x0 < x1 <= w and 0 <= y0 < y1 <= h


def test_reproject_disparity_geometry(calib):
    """A point reprojected with Q must match triangulation: Z = f*B/d."""
    import jax.numpy as jnp

    from primestereomatch_tpu.ops.depth import disparity_to_depth, reproject_disparity
    from primestereomatch_tpu.calib import stereo_rectify

    rect = stereo_rectify(
        calib["M1"], calib["D1"], calib["M2"], calib["D2"],
        IMG_SIZE, calib["R"], calib["T"], alpha=1.0,
    )
    Q = rect.Q
    f = Q[2, 3]
    baseline = abs(1.0 / Q[3, 2])  # |Tx|; Q[3,2] = -1/Tx with Tx < 0 here
    disp = jnp.full((10, 12), 16.0, jnp.float32)
    depth = np.asarray(disparity_to_depth(disp, Q))
    np.testing.assert_allclose(depth, f * baseline / 16.0, rtol=1e-5)

    pts = np.asarray(reproject_disparity(disp, Q))
    np.testing.assert_allclose(pts[..., 2], depth, rtol=1e-5)
    # X increases along image x, Y along image y (pinhole geometry)
    assert np.all(np.diff(pts[0, :, 0]) > 0)
    assert np.all(np.diff(pts[:, 0, 1]) > 0)
    # invalid disparity -> zeros
    z = np.asarray(reproject_disparity(jnp.zeros((4, 4), jnp.float32), Q))
    np.testing.assert_array_equal(z, 0.0)


def test_read_imagelist_xml_and_yml(tmp_path):
    # XML storage form — the reference's data/stereo_calib.xml layout
    # (consumed by readStringList, src/StereoCalib.cpp:349-361)
    from primestereomatch_tpu.calib.ymlio import read_imagelist

    xml = tmp_path / "stereo_calib.xml"
    xml.write_text(
        '<?xml version="1.0"?>\n<opencv_storage>\n<images>\n'
        "  chessboard0L.png chessboard0R.png\n"
        "  chessboard1L.png chessboard1R.png</images>\n</opencv_storage>\n"
    )
    names = read_imagelist(str(xml))
    assert names == [
        "chessboard0L.png", "chessboard0R.png",
        "chessboard1L.png", "chessboard1R.png",
    ]

    yml = tmp_path / "list.yml"
    yml.write_text('%YAML:1.0\n---\nimages:\n  - "a_L.png"\n  - "a_R.png"\n')
    assert read_imagelist(str(yml)) == ["a_L.png", "a_R.png"]

    flow = tmp_path / "flow.yml"
    flow.write_text('%YAML:1.0\n---\nimages: [ "b_L.png", "b_R.png" ]\n')
    assert read_imagelist(str(flow)) == ["b_L.png", "b_R.png"]
