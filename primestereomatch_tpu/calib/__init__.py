from primestereomatch_tpu.calib.ymlio import read_opencv_yml, write_opencv_yml  # noqa: F401
from primestereomatch_tpu.calib.distortion import (  # noqa: F401
    distort_points,
    undistort_points,
)
from primestereomatch_tpu.calib.rectify import (  # noqa: F401
    Rectifier,
    StereoRectification,
    init_undistort_rectify_map,
    load_stereo_calibration,
    stereo_rectify,
)
from primestereomatch_tpu.calib.chessboard import (  # noqa: F401
    corner_subpix,
    find_chessboard_corners,
)
from primestereomatch_tpu.calib.calibrate import (  # noqa: F401
    MonoCalibration,
    StereoCalibration,
    calibrate_camera,
    chessboard_object_points,
    epipolar_rms,
    stereo_calibrate,
)
from primestereomatch_tpu.calib.stereo_calib import (  # noqa: F401
    StereoCalibResult,
    calibrate_stereo_from_images,
)
from primestereomatch_tpu.calib.uncalibrated import (  # noqa: F401
    fundamental_8point,
    rectify_rotations_from_homographies,
    stereo_rectify_uncalibrated,
)
