from primestereomatch_tpu.utils.datasets import (  # noqa: F401
    DATASETS,
    MASK_DISC,
    MASK_NONE,
    MASK_NONOCC,
    StereoSample,
    load_dataset,
)
from primestereomatch_tpu.utils.eval import BPResult, bad_pixel_metrics  # noqa: F401
from primestereomatch_tpu.utils.display import (  # noqa: F401
    build_mosaic,
    disp_to_u8,
    save_png,
)
from primestereomatch_tpu.utils.features import (  # noqa: F401
    feature_index_color,
    feature_index_gray,
)
from primestereomatch_tpu.utils.profiling import (  # noqa: F401
    StageTimers,
    hbm_roofline_fraction,
    trace,
)
from primestereomatch_tpu.utils.video import (  # noqa: F401
    FrameSource,
    PairFileSource,
    SideBySideFileSource,
    SyntheticZEDSource,
    open_source,
)
