"""Middlebury dataset management (image mode).

Mirrors the reference's dataset table and filename schemas
(src/StereoMatch.cpp:528-554): Teddy/Cones use im2/im6 with GT disp2
(x4 disparity scale) plus occlusion and occ+discontinuity masks; the 2005
sets (Art, Books, Dolls, Laundry, Moebius, Reindeer) use view1/view5 with
GT disp1 (x3 scale) and no masks.

Images are returned in BGR uint8 channel order — the same memory order the
reference sees from cv::imread — so the pipeline's channel-order quirks
(color->gray conversion) reproduce exactly.
"""

from __future__ import annotations

import dataclasses
import os
import pathlib

import numpy as np

_DEF_ROOTS = (
    os.environ.get("PSM_DATA_DIR", ""),
    str(pathlib.Path(__file__).resolve().parents[2] / "data"),
    "data",
)

MASK_NONE, MASK_NONOCC, MASK_DISC = 0, 1, 2  # reference: StereoMatch.h:19-22


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    left: str
    right: str
    gt: str
    scale_factor: int
    occl: str | None = None
    disc: str | None = None
    default_mask: int = MASK_NONE


_2003 = dict(left="im2.png", right="im6.png", gt="disp2.png",
             occl="occl.png", disc="occ_and_discont.png",
             scale_factor=4, default_mask=MASK_NONOCC)
_2005 = dict(left="view1.png", right="view5.png", gt="disp1.png", scale_factor=3)

DATASETS: dict[str, DatasetSpec] = {
    "Teddy": DatasetSpec(**_2003),
    "Cones": DatasetSpec(**_2003),
    "Art": DatasetSpec(**_2005),
    "Books": DatasetSpec(**_2005),
    "Dolls": DatasetSpec(**_2005),
    "Laundry": DatasetSpec(**_2005),
    "Moebius": DatasetSpec(**_2005),
    "Reindeer": DatasetSpec(**_2005),
}


@dataclasses.dataclass
class StereoSample:
    name: str
    left_bgr: np.ndarray            # (H, W, 3) uint8
    right_bgr: np.ndarray
    gt: np.ndarray | None           # (H, W) uint8 scaled disparity
    mask_nonocc: np.ndarray | None  # (H, W) uint8 (0/255)
    mask_disc: np.ndarray | None
    scale_factor: int
    default_mask: int

    @property
    def left_f32(self) -> np.ndarray:
        # convertTo(CV_32F, 1/255.0f): v * (float)(1/255.0f)
        return self.left_bgr.astype(np.float32) * np.float32(1.0 / 255.0)

    @property
    def right_f32(self) -> np.ndarray:
        return self.right_bgr.astype(np.float32) * np.float32(1.0 / 255.0)


def _native_imread(path: str, channels: int) -> np.ndarray | None:
    if not path.lower().endswith(".png"):
        return None
    try:
        from primestereomatch_tpu import native

        if native.native_available():
            return native.imread(path, channels)
    except Exception:
        pass
    return None


def _imread_color(path: str) -> np.ndarray:
    img = _native_imread(path, 3)   # libpng fast path (native/psm_runtime.cpp)
    if img is not None:
        return img
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        from PIL import Image
        rgb = np.asarray(Image.open(path).convert("RGB"))
        return rgb[..., ::-1].copy()  # to BGR order


def _imread_gray(path: str) -> np.ndarray:
    img = _native_imread(path, 1)
    if img is not None:
        return img
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path).convert("L")).copy()


def data_root() -> pathlib.Path:
    for r in _DEF_ROOTS:
        if r and pathlib.Path(r).is_dir():
            return pathlib.Path(r)
    raise FileNotFoundError("No dataset root found; set PSM_DATA_DIR")


def load_dataset(name: str, root: str | os.PathLike | None = None) -> StereoSample:
    spec = DATASETS[name]
    base = pathlib.Path(root) if root else data_root()
    d = base / name
    left = _imread_color(str(d / spec.left))
    right = _imread_color(str(d / spec.right))
    gt = _imread_gray(str(d / spec.gt)) if (d / spec.gt).exists() else None
    occ = _imread_gray(str(d / spec.occl)) if spec.occl and (d / spec.occl).exists() else None
    disc = _imread_gray(str(d / spec.disc)) if spec.disc and (d / spec.disc).exists() else None
    return StereoSample(
        name=name, left_bgr=left, right_bgr=right, gt=gt,
        mask_nonocc=occ, mask_disc=disc,
        scale_factor=spec.scale_factor, default_mask=spec.default_mask,
    )
