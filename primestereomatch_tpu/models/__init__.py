from primestereomatch_tpu.models.gif_pipeline import StereoGIF, stereo_gif_forward  # noqa: F401
