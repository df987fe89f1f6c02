from primestereomatch_tpu.models.gif_pipeline import (  # noqa: F401
    StereoGIF,
    stereo_gif_forward,
    stereo_gif_forward_batch,
)
from primestereomatch_tpu.models.sgbm_pipeline import (  # noqa: F401
    StereoSGBM,
    sgbm_display_u8,
    stereo_sgbm_forward,
)
