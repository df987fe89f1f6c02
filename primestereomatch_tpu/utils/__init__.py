from primestereomatch_tpu.utils.datasets import DATASETS, StereoSample, load_dataset  # noqa: F401
from primestereomatch_tpu.utils.eval import bad_pixel_metrics  # noqa: F401
