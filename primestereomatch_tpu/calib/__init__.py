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
