"""Chessboard detection + calibration solvers on synthetic renders with
exact ground truth (the reference's interactive capture path,
src/StereoCalib.cpp:49-237, exercised headlessly)."""

import numpy as np
import pytest

from primestereomatch_tpu.calib.calibrate import (
    calibrate_camera,
    chessboard_object_points,
    epipolar_rms,
    stereo_calibrate,
    _project,
)
from primestereomatch_tpu.calib.chessboard import (
    corner_subpix,
    find_chessboard_corners,
    organize_grid,
)
from primestereomatch_tpu.calib.distortion import rodrigues

PATTERN = (9, 6)
IMG = (320, 240)   # (width, height)
K_TRUE = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
D_ZERO = np.zeros((1, 14))


def _poses(n):
    """Mildly varied board poses fully inside the view."""
    out = []
    for i in range(n):
        rv = np.array([0.22 * np.sin(i), 0.20 * np.cos(1.3 * i), 0.1 * np.sin(2.1 * i)])
        tv = np.array([-4.0 + 0.25 * np.sin(i * 1.7), -2.6 + 0.2 * np.cos(i), 10.5 + 0.8 * (i % 3)])
        out.append((rv, tv))
    return out


def _render(K, rv, tv, img_size=IMG, square_px=40, ss=2):
    """Render the checkerboard plane (squares of unit world size) through
    the pinhole (no distortion): supersampled inverse-homography sampling."""
    cols, rows = PATTERN
    R = rodrigues(rv)
    H = K @ np.column_stack([R[:, 0], R[:, 1], tv])  # world (X, Y, 1) -> image
    Hinv = np.linalg.inv(H)
    w, h = img_size
    # supersample positions centered on the pixel coordinate (mean offset 0)
    ys, xs = (np.mgrid[0:h * ss, 0:w * ss].astype(np.float64) + 0.5) / ss - 0.5
    pts = np.stack([xs, ys, np.ones_like(xs)], axis=-1) @ Hinv.T
    X = pts[..., 0] / pts[..., 2]
    Y = pts[..., 1] / pts[..., 2]
    # world corner lattice at integers 0..cols-1 / 0..rows-1; squares span
    # [-1, cols] x [-1, rows]
    inside = (X > -1) & (X < cols) & (Y > -1) & (Y < rows) & (pts[..., 2] > 0)
    checker = ((np.floor(X) + np.floor(Y)) % 2 == 0)
    img = np.where(inside, np.where(checker, 235.0, 20.0), 128.0)
    img = img.reshape(h, ss, w, ss).mean(axis=(1, 3))
    return img.astype(np.float32)


@pytest.fixture(scope="module")
def views():
    obj = chessboard_object_points(PATTERN)
    data = []
    for rv, tv in _poses(6):
        img = _render(K_TRUE, rv, tv)
        gt = _project(obj, rv, tv, K_TRUE, D_ZERO)
        data.append((img, gt, rv, tv))
    return data


def test_corner_detection_accuracy(views):
    img, gt, _, _ = views[0]
    corners = find_chessboard_corners(img, PATTERN)
    assert corners is not None
    # detection may start from either end; align to GT ordering
    if np.linalg.norm(corners[0] - gt[0]) > np.linalg.norm(corners[-1] - gt[0]):
        corners = corners[::-1]
    err = np.linalg.norm(corners - gt, axis=1)
    assert err.mean() < 0.3, f"mean corner error {err.mean():.3f}px"
    assert err.max() < 1.0


def test_detection_all_views(views):
    for img, gt, _, _ in views:
        corners = find_chessboard_corners(img, PATTERN)
        assert corners is not None
        if np.linalg.norm(corners[0] - gt[0]) > np.linalg.norm(corners[-1] - gt[0]):
            corners = corners[::-1]
        assert np.linalg.norm(corners - gt, axis=1).mean() < 0.5


def test_calibrate_camera_recovers_intrinsics(views):
    obj = chessboard_object_points(PATTERN)
    objs, imgs = [], []
    for img, gt, _, _ in views:
        corners = find_chessboard_corners(img, PATTERN)
        if np.linalg.norm(corners[0] - gt[0]) > np.linalg.norm(corners[-1] - gt[0]):
            corners = corners[::-1]
        objs.append(obj)
        imgs.append(corners)
    cal = calibrate_camera(objs, imgs, IMG)
    assert cal.rms < 0.3, f"reprojection RMS {cal.rms:.3f}px"
    assert abs(cal.K[0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0] < 0.02
    assert abs(cal.K[0, 2] - K_TRUE[0, 2]) < 5.0
    assert abs(cal.K[1, 2] - K_TRUE[1, 2]) < 5.0
    assert np.all(np.abs(cal.dist[0, :2]) < 0.05)  # true distortion is zero


def _render_photo(rv, tv, dist, img_size=IMG, seed=0, blur=1.2, noise=3.0):
    """Photo-realistic board render: lens distortion (inverse-warp through
    the undistort fixed point), defocus blur, vignetting, a non-uniform
    lighting gradient, textured background clutter, and sensor noise —
    the degradations real captures have and clean synthetic renders lack."""
    import cv2

    from primestereomatch_tpu.calib.distortion import undistort_points

    cols, rows = PATTERN
    R = rodrigues(rv)
    H = K_TRUE @ np.column_stack([R[:, 0], R[:, 1], tv])
    Hinv = np.linalg.inv(H)
    w, h = img_size
    ss = 2
    ys, xs = (np.mgrid[0:h * ss, 0:w * ss].astype(np.float64) + 0.5) / ss - 0.5
    uv = np.stack([xs, ys], axis=-1).reshape(-1, 2)
    # pixel (distorted) -> ideal pinhole pixel -> board plane
    und = undistort_points(uv, K_TRUE, dist, P=K_TRUE).reshape(h * ss, w * ss, 2)
    pts = np.concatenate([und, np.ones((*und.shape[:2], 1))], axis=-1) @ Hinv.T
    X = pts[..., 0] / pts[..., 2]
    Y = pts[..., 1] / pts[..., 2]
    rng = np.random.default_rng(seed)
    # checker shading on the (cols+1)x(rows+1)-square board, clutter outside
    inside = (X > -1) & (X < cols + 0) & (Y > -1) & (Y < rows + 0)
    checker = ((np.floor(X) + np.floor(Y)) % 2 == 0)
    img = np.where(inside, np.where(checker, 210.0, 40.0), 128.0)
    # background clutter: low-frequency random blobs
    bg = cv2.GaussianBlur(rng.normal(0, 60, (h // 8, w // 8)), (0, 0), 2)
    bg = cv2.resize(bg, (w * ss, h * ss), interpolation=cv2.INTER_CUBIC)
    img = np.where(inside, img, np.clip(128.0 + bg, 0, 255))
    img = img.reshape(h, ss, w, ss).mean(axis=(1, 3))  # supersample box-down
    # lighting gradient + vignette
    yy, xx = np.mgrid[0:h, 0:w]
    img *= 0.75 + 0.35 * (xx / w) - 0.15 * (yy / h)
    r2 = ((xx - w / 2) / w) ** 2 + ((yy - h / 2) / h) ** 2
    img *= 1.0 - 0.5 * r2
    img = cv2.GaussianBlur(img, (0, 0), blur)
    img += rng.normal(0, noise, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_chessboard_detection_photo_degraded():
    """Detector robustness on photo-like captures (distortion + blur +
    vignetting + clutter + noise), cross-checked against BOTH the exact
    projected corners and cv2.findChessboardCorners as an independent
    oracle on the identical images."""
    import cv2

    d = np.zeros((1, 14))
    d[0, :5] = [-0.18, 0.05, 1e-3, -5e-4, 0.0]
    obj = chessboard_object_points(PATTERN)
    n_ok = 0
    for i, (rv, tv) in enumerate(_poses(6)):
        img = _render_photo(rv, tv, d, seed=i)
        gt = _project(obj, rv, tv, K_TRUE, d)

        ok_cv, cv_corners = cv2.findChessboardCorners(
            img, PATTERN,
            flags=cv2.CALIB_CB_ADAPTIVE_THRESH | cv2.CALIB_CB_NORMALIZE_IMAGE,
        )
        if not ok_cv:
            continue  # too hard even for the production detector: not a fair case
        n_ok += 1
        corners = find_chessboard_corners(img, PATTERN)
        assert corners is not None, f"view {i}: detector failed where cv2 succeeded"
        if np.linalg.norm(corners[0] - gt[0]) > np.linalg.norm(corners[-1] - gt[0]):
            corners = corners[::-1]
        err = np.linalg.norm(corners - gt, axis=1)
        assert err.max() < 2.0, f"view {i}: max corner error {err.max():.2f}px"
        rms = float(np.sqrt((err ** 2).mean()))
        assert rms < 0.8, f"view {i}: corner RMS {rms:.2f}px"
    assert n_ok >= 4, f"only {n_ok} views detectable by the cv2 oracle"


def test_calibrate_camera_rational_model():
    """n_dist=8 (CALIB_RATIONAL_MODEL, the reference flag set
    src/StereoCalib.cpp:162-171): the solver must recover nonzero
    k4..k6 from exact synthetic observations of a rational lens."""
    d_true = np.zeros((1, 14))
    d_true[0, :8] = [0.08, -0.12, 1e-3, -8e-4, 0.02, 0.15, -0.06, 0.01]
    obj = chessboard_object_points(PATTERN)
    objs, imgs = [], []
    for rv, tv in _poses(12):
        objs.append(obj)
        imgs.append(_project(obj, rv, tv, K_TRUE, d_true))
    cal = calibrate_camera(objs, imgs, IMG, n_dist=8)
    assert cal.rms < 1e-3, f"reprojection RMS {cal.rms:.5f}px"
    # the rational numerator/denominator trade off against each other, so
    # assert the net radial curve, not raw coefficients: cdist(r2) equal
    # on the observed radius range
    from primestereomatch_tpu.calib.distortion import _coeffs

    r2 = np.linspace(0, 0.6, 50)
    def cdist(d):
        k1, k2, p1, p2, k3, k4, k5, k6, *_ = _coeffs(d)
        return (1 + k1 * r2 + k2 * r2**2 + k3 * r2**3) / (
            1 + k4 * r2 + k5 * r2**2 + k6 * r2**3)
    np.testing.assert_allclose(cdist(cal.dist), cdist(d_true), atol=1e-4)
    # tangential terms are directly identifiable
    np.testing.assert_allclose(cal.dist[0, 2:4], d_true[0, 2:4], atol=1e-4)


def test_stereo_calibrate_and_epipolar(views):
    """Full stereo: right camera = left translated by a baseline; solve
    from synthetic corner observations and verify R, T, epipolar RMS."""
    obj = chessboard_object_points(PATTERN)
    R_TRUE = rodrigues(np.array([0.0, 0.03, 0.0]))
    T_TRUE = np.array([-2.0, 0.0, 0.05])

    objs, lpts, rpts = [], [], []
    rng = np.random.default_rng(0)
    for _, _, rv, tv in views:
        gl = _project(obj, rv, tv, K_TRUE, D_ZERO)
        R1 = rodrigues(rv)
        R2 = R_TRUE @ R1
        t2 = R_TRUE @ tv + T_TRUE
        gr = _project(obj, rodrigues(R2), t2, K_TRUE, D_ZERO)
        noise = lambda: rng.normal(0, 0.05, gl.shape)
        objs.append(obj)
        lpts.append(gl + noise())
        rpts.append(gr + noise())

    cal = stereo_calibrate(objs, lpts, rpts, IMG)
    assert cal.rms < 0.2, f"stereo RMS {cal.rms:.3f}px"
    # rotation error in degrees
    dR = cal.R @ R_TRUE.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.2, f"rotation error {ang:.3f} deg"
    t_err = np.linalg.norm(cal.T.reshape(3) - T_TRUE)
    assert t_err < 0.05, f"translation error {t_err:.4f}"
    rms_e = epipolar_rms(cal, lpts, rpts)
    assert rms_e < 0.3, f"epipolar RMS {rms_e:.3f}px"


def test_stereo_then_rectify_integration(views):
    """Calibrate -> stereo_rectify -> projected points land on equal rows
    (closes the loop with calib/rectify.py)."""
    from primestereomatch_tpu.calib.distortion import undistort_points
    from primestereomatch_tpu.calib.rectify import stereo_rectify

    obj = chessboard_object_points(PATTERN)
    R_TRUE = rodrigues(np.array([0.0, 0.02, 0.01]))
    T_TRUE = np.array([-2.0, 0.02, 0.0])
    objs, lpts, rpts = [], [], []
    for _, _, rv, tv in views:
        gl = _project(obj, rv, tv, K_TRUE, D_ZERO)
        R2 = R_TRUE @ rodrigues(rv)
        t2 = R_TRUE @ tv + T_TRUE
        gr = _project(obj, rodrigues(R2), t2, K_TRUE, D_ZERO)
        objs.append(obj)
        lpts.append(gl)
        rpts.append(gr)
    cal = stereo_calibrate(objs, lpts, rpts, IMG, fix_intrinsics=False)
    rect = stereo_rectify(cal.K1, cal.D1, cal.K2, cal.D2, IMG, cal.R, cal.T)
    r1 = undistort_points(lpts[0], cal.K1, cal.D1, R=rect.R1, P=rect.P1, iterations=40)
    r2 = undistort_points(rpts[0], cal.K2, cal.D2, R=rect.R2, P=rect.P2, iterations=40)
    np.testing.assert_allclose(r1[:, 1], r2[:, 1], atol=0.2)
    assert np.all(r1[:, 0] > r2[:, 0])  # positive disparity


def test_cli_recalibrate_end_to_end(tmp_path, views):
    """Rendered chessboard pairs -> CLI --RECALIBRATE -> YMLs on disk that
    load_stereo_calibration + stereo_rectify accept (full reference flow)."""
    from PIL import Image

    from primestereomatch_tpu.cli import main
    from primestereomatch_tpu.calib import load_stereo_calibration, stereo_rectify

    R_TRUE = rodrigues(np.array([0.0, 0.02, 0.0]))
    T_TRUE = np.array([-2.0, 0.0, 0.0])
    board = tmp_path / "boards"
    board.mkdir()
    for i, (_, _, rv, tv) in enumerate(views):
        li = _render(K_TRUE, rv, tv)
        R2 = R_TRUE @ rodrigues(rv)
        t2 = R_TRUE @ tv + T_TRUE
        ri = _render(K_TRUE, rodrigues(R2), t2)
        Image.fromarray(li.astype(np.uint8)).save(board / f"cap{i}_left.png")
        Image.fromarray(ri.astype(np.uint8)).save(board / f"cap{i}_right.png")

    out = tmp_path / "calib"
    rc = main([
        "-a", "STEREO_SGBM", "--max-dis", "8", "--frames", "1", "--mask", "none",
        "video", "--source", "synthetic", "--RECALIBRATE",
        "--chessboard-dir", str(board), "--calib-dir", str(out),
        "--calib-size", f"{IMG[0]}x{IMG[1]}",
    ])
    assert rc == 0
    calib = load_stereo_calibration(
        str(out / "intrinsics.yml"), str(out / "extrinsics.yml")
    )
    assert abs(calib["M1"][0, 0] - K_TRUE[0, 0]) / K_TRUE[0, 0] < 0.03
    t = calib["T"].reshape(3)
    assert abs(t[0] - T_TRUE[0]) < 0.1
    rect = stereo_rectify(
        calib["M1"], calib["D1"], calib["M2"], calib["D2"], IMG,
        calib["R"], calib["T"],
    )
    np.testing.assert_allclose(rect.P1[:, :3], rect.P2[:, :3], atol=1e-6)


def test_hartley_uncalibrated_rectification(views):
    """8-point F + Hartley homographies on synthetic correspondences:
    epipolar constraint holds and rectified rows align."""
    from primestereomatch_tpu.calib.uncalibrated import (
        fundamental_8point,
        stereo_rectify_uncalibrated,
    )

    R_TRUE = rodrigues(np.array([0.01, 0.03, 0.005]))
    T_TRUE = np.array([-2.0, 0.05, 0.1])
    obj = chessboard_object_points(PATTERN)
    p1, p2 = [], []
    for _, _, rv, tv in views:
        p1.append(_project(obj, rv, tv, K_TRUE, D_ZERO))
        R2 = R_TRUE @ rodrigues(rv)
        t2 = R_TRUE @ tv + T_TRUE
        p2.append(_project(obj, rodrigues(R2), t2, K_TRUE, D_ZERO))
    p1 = np.concatenate(p1)
    p2 = np.concatenate(p2)

    F = fundamental_8point(p1, p2)
    ph1 = np.hstack([p1, np.ones((len(p1), 1))])
    ph2 = np.hstack([p2, np.ones((len(p2), 1))])
    resid = np.abs(np.sum(ph2 * (ph1 @ F.T), axis=1))
    lines = ph1 @ F.T
    dist = resid / np.hypot(lines[:, 0], lines[:, 1])
    assert dist.mean() < 0.05, f"epipolar residual {dist.mean():.4f}px"

    H1, H2 = stereo_rectify_uncalibrated(p1, p2, F, IMG)

    def apply(H, p):
        ph = np.hstack([p, np.ones((len(p), 1))]) @ H.T
        return ph[:, :2] / ph[:, 2:3]

    r1 = apply(H1, p1)
    r2 = apply(H2, p2)
    rows_err = np.abs(r1[:, 1] - r2[:, 1])
    assert rows_err.mean() < 1.0, f"row misalignment {rows_err.mean():.3f}px"
