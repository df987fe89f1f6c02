"""Run the STEREO_GIF golden path on the Middlebury sets and print %BP,
mirroring the reference's per-frame evaluation printout."""

import time

import numpy as np
import jax

from primestereomatch_tpu.config import GIFConfig
from primestereomatch_tpu.models import stereo_gif_forward
from primestereomatch_tpu.utils import load_dataset, bad_pixel_metrics
from primestereomatch_tpu.utils.datasets import MASK_NONOCC

if __name__ == "__main__":
    cfg = GIFConfig()
    for name in ["Teddy", "Cones", "Art", "Books", "Dolls", "Laundry",
                 "Moebius", "Reindeer"]:
        s = load_dataset(name)
        l = jax.numpy.asarray(s.left_f32)
        r = jax.numpy.asarray(s.right_f32)
        t0 = time.perf_counter()
        ld, rd = stereo_gif_forward(l, r, cfg)
        ld, rd = np.asarray(ld), np.asarray(rd)
        dt = time.perf_counter() - t0
        mask = s.mask_nonocc if s.default_mask == MASK_NONOCC else None
        res = bad_pixel_metrics(ld, s.gt, s.scale_factor, cfg.max_dis,
                                mask=mask)
        res_none = bad_pixel_metrics(ld, s.gt, s.scale_factor, cfg.max_dis)
        print(f"{name:10s} %BP(nonocc)={res.percent_bad_pixels:6.2f} "
              f"%BP(none)={res_none.percent_bad_pixels:6.2f} "
              f"avgErr={res.avg_err:5.2f}  ({dt*1e3:.0f} ms)")
