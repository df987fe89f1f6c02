"""primestereomatch_tpu — a TPU-native dense stereo disparity engine.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
PRiME-project/PRiMEStereoMatch (C++17/OpenCL/OpenCV): guided-image-filter
local stereo (STEREO_GIF), semi-global matching (STEREO_SGBM), calibration /
rectification, live ground-truth evaluation, and a streaming runtime —
re-designed TPU-first (static shapes, fused elementwise math, mesh sharding
over disparity blocks and image tiles).

Reference semantics are documented per-op with file:line citations into the
reference tree (see SURVEY.md).
"""

__version__ = "0.1.0"

from primestereomatch_tpu.config import GIFConfig, SGBMConfig, EvalConfig  # noqa: F401
