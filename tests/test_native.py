"""Native host runtime (libpng IO + prefetching frame source) vs the
Python imaging fallback — decodes must agree bitwise."""

import numpy as np
import pytest

from primestereomatch_tpu import native


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native runtime not built"
)


def _pil_read(path):
    from PIL import Image

    rgb = np.asarray(Image.open(path).convert("RGB"))
    return rgb[..., ::-1]


def test_imread_matches_pil(tmp_path, rng):
    from PIL import Image

    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    got = native.imread(p, 3)
    np.testing.assert_array_equal(got, img[..., ::-1])  # BGR order


def test_imread_dataset_images():
    from primestereomatch_tpu.utils.datasets import data_root

    p = str(data_root() / "Teddy" / "im2.png")
    got = native.imread(p, 3)
    want = _pil_read(p)
    np.testing.assert_array_equal(got, want)
    gray = native.imread(str(data_root() / "Teddy" / "disp2.png"), 1)
    assert gray.ndim == 2 and gray.shape == got.shape[:2]


def test_imwrite_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    p = str(tmp_path / "w.png")
    native.imwrite_png(p, img, bgr=True)
    np.testing.assert_array_equal(native.imread(p, 3), img)
    gray = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    native.imwrite_png(str(tmp_path / "g.png"), gray)
    np.testing.assert_array_equal(
        native.imread(str(tmp_path / "g.png"), 1), gray
    )


def test_prefetch_source_in_order(tmp_path, rng):
    from PIL import Image

    frames = []
    for i in range(8):
        f = rng.integers(0, 256, (12, 40, 3), dtype=np.uint8)
        f[0, 0] = i  # frame fingerprint
        frames.append(f)
        Image.fromarray(f).save(tmp_path / f"f{i:03d}.png")
    src = native.PrefetchSource(
        sorted(str(p) for p in tmp_path.glob("*.png")),
        side_by_side=True, threads=3, depth=2,
    )
    got = list(src)
    assert len(got) == 8
    for i, (l, r) in enumerate(got):
        np.testing.assert_array_equal(l, frames[i][:, :20, ::-1])
        np.testing.assert_array_equal(r, frames[i][:, 20:, ::-1])
    with pytest.raises(StopIteration):
        next(src)
    src.close()


def test_prefetch_pairs_and_loop(tmp_path, rng):
    from PIL import Image

    pairs = []
    for i in range(3):
        l = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
        r = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
        lp, rp = tmp_path / f"{i}_l.png", tmp_path / f"{i}_r.png"
        Image.fromarray(l).save(lp)
        Image.fromarray(r).save(rp)
        pairs.append((str(lp), str(rp)))
    src = native.PrefetchSource(pairs, side_by_side=False, loop=True, threads=2)
    for _ in range(7):  # loops past the end
        l, r = next(src)
        assert l.shape == (10, 14, 3) and r.shape == (10, 14, 3)
    src.close()


def test_prefetch_stress_no_deadlock(tmp_path, rng):
    """Regression for the round-1 capacity-starvation deadlock: many workers
    racing on a tiny capacity (depth=1) with frames of very different decode
    cost. A worker holding the next in-order frame must be able to bypass the
    capacity wait; before the fix this configuration could hang forever.
    Run under a hard wall-clock bound via a worker thread + join timeout."""
    import threading

    from PIL import Image

    n = 48
    for i in range(n):
        # alternate tiny and larger frames so decode times interleave badly
        h, w = (6, 12) if i % 3 else (96, 160)
        f = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        f[0, 0, 0] = i % 251
        Image.fromarray(f).save(tmp_path / f"p{i:03d}_l.png")
        Image.fromarray(f).save(tmp_path / f"p{i:03d}_r.png")
    pairs = [
        (str(tmp_path / f"p{i:03d}_l.png"), str(tmp_path / f"p{i:03d}_r.png"))
        for i in range(n)
    ]
    got = []

    def run():
        src = native.PrefetchSource(pairs, side_by_side=False, threads=6, depth=1)
        for l, _ in src:
            got.append(int(l[0, 0, 2]))  # BGR fingerprint
        src.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=60)
    assert not t.is_alive(), "prefetch source deadlocked"
    assert got == [i % 251 for i in range(n)]


def test_now_us_monotonic():
    a = native.now_us()
    b = native.now_us()
    assert b >= a > 0
