"""Timing-only split of the WMF kernel's pass-1 costs at 2K (run on TPU).

Patches the kernel source text to produce (wrong-result) variants that
isolate: the exp() transcendental, the whole weight computation, and
pass 2. Results guide optimization only — never merged.
"""
import pathlib
import sys
import time
import types

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

SRC = pathlib.Path("primestereomatch_tpu/kernels/wmf_pallas.py").read_text()

VARIANTS = {
    "full": [],
    "no_exp": [("jnp.exp(-dist2 * inv_two_sig2) * vq", "(dist2 + inv_two_sig2) * vq")],
    "no_pass2": [("lambda c: c[0] > 1", "lambda c: c[0] > 2147483000")],
    "no_exp_no_pass2": [
        ("jnp.exp(-dist2 * inv_two_sig2) * vq", "(dist2 + inv_two_sig2) * vq"),
        ("lambda c: c[0] > 1", "lambda c: c[0] > 2147483000"),
    ],
}


def load_variant(name):
    src = SRC
    for old, new in VARIANTS[name]:
        assert old in src, (name, old)
        src = src.replace(old, new)
    mod = types.ModuleType(f"wmf_variant_{name}")
    mod.__dict__["__name__"] = f"wmf_variant_{name}"
    exec(compile(src, f"<wmf:{name}>", "exec"), mod.__dict__)
    return mod


H, W = 1242, 2208
rng = np.random.default_rng(0)
guide_u8 = jnp.asarray((rng.random((H, W, 3)) * 255).astype(np.uint8))
from scipy.ndimage import uniform_filter

smooth = uniform_filter(rng.random((H, W)) * 255, size=51)
disp = jnp.asarray(np.clip(smooth, 0, 255).astype(np.uint8))


def timeit(fn, n=8):
    out = fn()
    np.asarray(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


for name in VARIANTS:
    mod = load_variant(name)
    f = jax.jit(lambda d, g, m=mod: m.joint_wmf_pallas(
        d, g, radius=9, n_bins=256, sigma=25.5))
    t = timeit(lambda: f(disp, guide_u8))
    print(f"WMF 2K/view [{name}]: {t:.2f} ms", flush=True)
