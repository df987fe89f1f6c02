"""Application layer: CLI parsing, frame sources, app orchestration,
mosaic output. Uses tiny configs so everything compiles fast on CPU."""

import numpy as np
import pytest

from primestereomatch_tpu.app import AppConfig, StereoMatchApp
from primestereomatch_tpu.cli import build_parser, main
from primestereomatch_tpu.utils.display import build_mosaic, disp_to_u8, save_png
from primestereomatch_tpu.utils.video import (
    PairFileSource,
    SideBySideFileSource,
    SyntheticZEDSource,
    open_source,
)


def test_cli_parser_matches_reference_surface():
    p = build_parser()
    a = p.parse_args(["-a", "STEREO_GIF", "image", "--dataset", "Teddy"])
    assert a.alg == "STEREO_GIF" and a.command == "image" and a.dataset == "Teddy"
    a = p.parse_args(["-a", "STEREO_SGBM", "video", "--RECALIBRATE"])
    assert a.RECALIBRATE and not a.RECAPTURE
    with pytest.raises(SystemExit):
        p.parse_args(["image"])  # -a is required, like the reference
    with pytest.raises(SystemExit):
        p.parse_args(["-a", "BOGUS", "image"])


def test_synthetic_source_geometry():
    src = SyntheticZEDSource(width=64, height=32, n_frames=3, max_disparity=8)
    l0, r0 = next(src)
    assert l0.shape == (32, 64, 3) and l0.dtype == np.uint8
    assert np.array_equal(l0, r0)  # frame 0: disparity 0
    l1, r1 = next(src)
    # frame 1: true disparity 1 -> left pixel x matches right pixel x-1
    np.testing.assert_array_equal(l1[:, 1:], r1[:, :-1])


def test_file_sources(tmp_path, rng):
    from PIL import Image

    sbs = rng.integers(0, 255, (16, 40, 3), dtype=np.uint8)
    Image.fromarray(sbs).save(tmp_path / "f0.png")
    Image.fromarray(sbs).save(tmp_path / "f1.png")
    src = SideBySideFileSource(str(tmp_path))
    frames = list(src)
    assert len(frames) == 2
    l, r = frames[0]
    assert l.shape == (16, 20, 3) and r.shape == (16, 20, 3)

    d = tmp_path / "pairs"
    d.mkdir()
    Image.fromarray(sbs[:, :20]).save(d / "a_left.png")
    Image.fromarray(sbs[:, 20:]).save(d / "a_right.png")
    src = open_source(f"{d}:pairs")
    l, r = next(src)
    assert l.shape == r.shape == (16, 20, 3)


def test_mosaic_layouts(rng):
    H, W = 8, 10
    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    disp = rng.integers(0, 64, (H, W)).astype(np.uint8)
    m2 = build_mosaic(img, img, disp, disp)
    assert m2.shape == (2 * H, 2 * W, 3)
    gt = rng.integers(0, 255, (H, W)).astype(np.uint8)
    m3 = build_mosaic(img, img, disp, disp, gt=gt, err_map=gt)
    assert m3.shape == (2 * H, 3 * W, 3)
    np.testing.assert_array_equal(m3[:H, 2 * W :, 0], gt)


def test_disp_to_u8_saturates():
    d = np.array([[10, 100]], np.uint8)
    out = disp_to_u8(d, 4)
    np.testing.assert_array_equal(out, [[40, 255]])


@pytest.fixture()
def small_video_app():
    return StereoMatchApp(AppConfig(
        alg="STEREO_SGBM", media_mode="video", video_source="synthetic",
        max_dis=16, mask_mode="none",
    ))


def test_app_video_sgbm(small_video_app, monkeypatch):
    # shrink the synthetic stream for speed
    small_video_app._source = SyntheticZEDSource(
        width=96, height=48, n_frames=2, max_disparity=8, smoothing=0
    )
    r0 = small_video_app.compute()
    r1 = small_video_app.compute()
    assert r0.l_disp.shape == (48, 96)
    assert r1.frame_index == 1
    assert "total" in r1.times_ms
    # frame 1 true disparity is 1: the interior should mostly agree
    interior = r1.l_disp[8:-8, 16:-16]
    assert np.median(interior) == 1


def test_app_image_gif_timed(tmp_path, rng):
    from PIL import Image

    src = SyntheticZEDSource(width=64, height=32, n_frames=4, max_disparity=8,
                             smoothing=0)
    next(src)
    next(src)
    l, r = next(src)  # true disparity 2
    Image.fromarray(l[..., ::-1]).save(tmp_path / "l.png")
    Image.fromarray(r[..., ::-1]).save(tmp_path / "r.png")
    app = StereoMatchApp(AppConfig(
        alg="STEREO_GIF", media_mode="image",
        left=str(tmp_path / "l.png"), right=str(tmp_path / "r.png"),
        max_dis=8, med_sz=7, timed=True, mask_mode="none",
    ))
    res = app.compute()
    assert set(res.times_ms) >= {"CVC", "CVF", "DispSel", "PP", "total"}
    assert np.median(res.l_disp[8:-8, 16:-16]) == 2
    mosaic = app.mosaic(res)
    assert mosaic.shape == (64, 128, 3)
    save_png(str(tmp_path / "m.png"), mosaic)
    assert (tmp_path / "m.png").exists()


def test_app_toggles(small_video_app):
    app = small_video_app
    app.set_algorithm("STEREO_GIF")
    assert app.cfg.alg == "STEREO_GIF"
    app.set_subsample(2)
    assert app.gif_cfg.subsample == 2
    app.set_mask_mode("disc")
    with pytest.raises(ValueError):
        app.set_algorithm("NOPE")
    with pytest.raises(ValueError):
        app.update_dataset("NotADataset")


def test_forward_batch_matches_per_frame(rng):
    """stereo_gif_forward_batch (CVC batch folded into rows, per-frame
    tail) is bitwise-equal to per-frame stereo_gif_forward."""
    import jax.numpy as jnp

    from primestereomatch_tpu.config import GIFConfig
    from primestereomatch_tpu.models import (
        stereo_gif_forward,
        stereo_gif_forward_batch,
    )

    cfg = GIFConfig(max_dis=16)
    # 72x52: W=52 is not a multiple of s=4*13... use both grid kinds
    for H, W in ((64, 64), (60, 52)):
        frames = [
            (rng.random((H, W, 3), dtype=np.float32),
             rng.random((H, W, 3), dtype=np.float32))
            for _ in range(3)
        ]
        lb = jnp.asarray(np.stack([f[0] for f in frames]))
        rb = jnp.asarray(np.stack([f[1] for f in frames]))
        out_l, out_r = stereo_gif_forward_batch(lb, rb, cfg)
        for i, (l, r) in enumerate(frames):
            ref_l, ref_r = stereo_gif_forward(jnp.asarray(l), jnp.asarray(r), cfg)
            np.testing.assert_array_equal(np.asarray(out_l[i]), np.asarray(ref_l))
            np.testing.assert_array_equal(np.asarray(out_r[i]), np.asarray(ref_r))
    with pytest.raises(ValueError, match="exact-WMF"):
        stereo_gif_forward_batch(lb, rb, GIFConfig(max_dis=16, pp_toolchain=True))


def test_keyloop_dispatch(small_video_app):
    """Reference HCI keys (src/main.cpp:80-198) drive the live setters."""
    from primestereomatch_tpu.hci import KeyLoop

    app = small_video_app
    msgs = []
    feed = ["a", "m", "m", "o", "s", "=", "=", "-", "h", "d", "x", "q"]
    kl = KeyLoop(app, reader=lambda: feed.pop(0) if feed else "",
                 echo=msgs.append)
    assert kl.pump()                       # 'a': SGBM -> GIF
    assert app.cfg.alg == "STEREO_GIF"
    assert kl.pump()                       # 'm' on GIF (CPU): refuses pallas
    assert "no TPU" in msgs[-1]
    app.set_algorithm("STEREO_SGBM")
    assert kl.pump()                       # 'm' on SGBM: hh -> sgbm
    assert app.sgbm_cfg.mode == "sgbm"
    assert kl.pump()                       # 'o': none -> nonocc
    assert app.cfg.mask_mode == "nonocc"
    assert kl.pump()                       # 's': 4 -> 8
    assert app.cfg.subsample == 8
    assert app.sgbm_cfg.mode == "sgbm"     # mode survives the engine rebuild
    thr = app.cfg.error_threshold
    assert kl.pump() and app.cfg.error_threshold == thr + 1   # '='
    assert kl.pump() and app.cfg.error_threshold == thr + 2
    assert kl.pump() and app.cfg.error_threshold == thr + 1   # '-'
    assert kl.pump()                       # 'h': help text
    assert "current:" in msgs[-1]
    assert kl.pump()                       # 'd' in video mode: refused
    assert "image mode" in msgs[-1]
    assert kl.pump()                       # unknown key ignored
    assert not kl.pump()                   # 'q' stops the run


def test_keyloop_dataset_cycle():
    from primestereomatch_tpu.hci import KeyLoop

    app = StereoMatchApp(AppConfig(
        alg="STEREO_GIF", media_mode="image", dataset="Cones", max_dis=16,
    ))
    kl = KeyLoop(app, reader=lambda: "", echo=lambda s: None)
    start = app.cfg.dataset
    assert kl.handle("d")
    assert app.cfg.dataset != start and app._sample is not None


def test_keyloop_parallelism_digits(small_video_app):
    """'1'-'8' (the reference thread-count keys, src/main.cpp:96-195) set
    the WTA disparity-chunk depth — and the setting takes effect on the
    engine config, clamped to a divisor of max_dis."""
    from primestereomatch_tpu.hci import KeyLoop

    app = small_video_app
    msgs = []
    kl = KeyLoop(app, reader=lambda: "", echo=msgs.append)
    from primestereomatch_tpu.models.gif_pipeline import _wta_dc

    assert kl.handle("6")                  # 2^5 = 32, clamped to max_dis
    assert app.gif_cfg.wta_d_chunk == 32
    assert str(min(32, app.cfg.max_dis)) in msgs[-1]
    assert kl.handle("1")
    assert app.gif_cfg.wta_d_chunk == 1 and _wta_dc(app.gif_cfg) == 1
    assert kl.handle("8")                  # 128 clamps to a max_dis divisor
    assert _wta_dc(app.gif_cfg) == min(128, app.cfg.max_dis)
    kl.handle("h")
    assert any("1-8" in m for m in msgs)


def test_cli_image_interactive_keys(capsys, monkeypatch):
    """Image-mode CLI runs the key loop too (reference src/main.cpp:80-198
    polls in both media modes): 'd' cycles the dataset mid-run and a digit
    key lands on the engine config."""
    feed = ["d", "3", "q"]
    monkeypatch.setattr(
        "primestereomatch_tpu.hci._stdin_reader",
        lambda: feed.pop(0) if feed else "",
    )
    rc = main([
        "-a", "STEREO_GIF", "--max-dis", "16", "--frames", "4",
        "--mask", "none", "image", "--dataset", "Cones",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Dataset changed to" in out
    assert "Disparity-chunk depth" in out and "4" in out
    # 'q' (read after frame 2) stopped the 4-frame run early
    assert "frame 2" in out and "frame 3" not in out


def test_cli_video_quit_key(capsys, monkeypatch):
    """'q' on stdin stops a multi-frame video run after the first frame."""
    feed = ["q"]
    monkeypatch.setattr(
        "primestereomatch_tpu.hci._stdin_reader",
        lambda: feed.pop(0) if feed else "",
    )
    rc = main([
        "-a", "STEREO_SGBM", "--max-dis", "8", "--frames", "5",
        "--mask", "none", "video", "--source", "synthetic",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "frame 0" in out and "frame 1" not in out


def test_cli_main_video(capsys):
    rc = main([
        "-a", "STEREO_SGBM", "--max-dis", "8", "--frames", "1",
        "--mask", "none", "video", "--source", "synthetic",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "STEREO_SGBM" in out and "frame 0" in out


def test_cli_recalibrate_headless_fails(capsys):
    rc = main(["-a", "STEREO_GIF", "video", "--RECALIBRATE"])
    assert rc == 1


def test_app_stream_pipelined():
    app = StereoMatchApp(AppConfig(
        alg="STEREO_GIF", media_mode="video", video_source="synthetic",
        max_dis=8, med_sz=7, mask_mode="none",
    ))
    app._source = SyntheticZEDSource(
        width=64, height=32, n_frames=5, max_disparity=8, smoothing=0
    )
    results = list(app.stream(4))
    assert [r.frame_index for r in results] == [0, 1, 2, 3]
    # frame 2's true disparity is 2
    assert np.median(results[2].l_disp[8:-8, 16:-16]) == 2
    # stream drains correctly when the source runs out
    results = list(app.stream(10))
    assert len(results) == 1  # only frame 4 was left


def test_dispest_dump_cost_volume(tmp_path, rng):
    """printCV parity (src/DispEst.cpp:181-194): every slice as a PNG."""
    import jax.numpy as jnp

    from primestereomatch_tpu.config import GIFConfig
    from primestereomatch_tpu.models.gif_pipeline import DispEst

    e = DispEst(GIFConfig(max_dis=4, med_sz=7))
    l = jnp.asarray(rng.random((16, 24, 3), dtype=np.float32))
    r = jnp.asarray(rng.random((16, 24, 3), dtype=np.float32))
    lcv, _ = e.cost_const(l, r)
    paths = e.dump_cost_volume(lcv, str(tmp_path / "cv_"))
    assert len(paths) == 4
    from primestereomatch_tpu.utils.datasets import _imread_gray

    img = _imread_gray(paths[2])
    want = np.clip(np.rint(np.asarray(lcv)[2] * 255.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(img, want)


def test_stage_timers_and_roofline():
    from primestereomatch_tpu.utils.profiling import (
        StageTimers,
        gif_hbm_bytes,
        hbm_roofline_fraction,
    )

    t = StageTimers()
    with t.stage("CVC"):
        pass
    with t.stage("CVC"):
        pass
    assert t.stages["CVC"].count == 2
    assert "CVC" in t.report()
    b = gif_hbm_bytes(375, 450, 64, 4)
    assert b > 100e6
    frac = hbm_roofline_fraction(0.005, 375, 450, 64, 4)
    assert 0 < frac < 1
