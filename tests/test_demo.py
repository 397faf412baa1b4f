"""Demo driver smoke: synthetic frame -> rendered PNG via the CLI path."""
import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")


def test_demo_renders_png(tmp_path, monkeypatch):
    import metro_pose3d_tpu.config as config_mod
    from metro_pose3d_tpu.config import apply_overrides

    # shrink the default model so the random-init demo runs in seconds on CPU
    real_config = config_mod.Config
    tiny = apply_overrides(real_config(), {
        "model.backbone": "tiny", "model.proc_side": "64", "model.depth": "4",
        "model.compute_dtype": "float32", "data.source_side": "128",
    })
    monkeypatch.setattr(config_mod, "Config", lambda: tiny)

    from metro_pose3d_tpu.demo import main

    out = tmp_path / "demo.png"
    rc = main(["--out", str(out)])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 10_000


def test_demo_video_mode(tmp_path, monkeypatch):
    """--video=N: synthetic moving-people sequence through the pipelined
    estimate_stream into an mp4 (or frame npz where no codec exists)."""
    import os

    import metro_pose3d_tpu.config as config_mod
    from metro_pose3d_tpu.config import apply_overrides

    real_config = config_mod.Config
    tiny = apply_overrides(real_config(), {
        "model.backbone": "tiny", "model.proc_side": "64", "model.depth": "4",
        "model.compute_dtype": "float32", "data.source_side": "128",
    })
    monkeypatch.setattr(config_mod, "Config", lambda: tiny)

    from metro_pose3d_tpu.demo import main

    out = tmp_path / "demo.mp4"
    rc = main(["--video", "4", "--out", str(out)])
    assert rc == 0
    wrote = [p for p in os.listdir(tmp_path) if p.startswith("demo.mp4")]
    assert wrote, os.listdir(tmp_path)
    assert (tmp_path / wrote[0]).stat().st_size > 5_000


def test_demo_video_codec_fallback(tmp_path, monkeypatch):
    """When no mp4 codec exists, --video must fall back to a frames npz."""
    import cv2

    import metro_pose3d_tpu.config as config_mod
    from metro_pose3d_tpu.config import apply_overrides

    tiny = apply_overrides(config_mod.Config(), {
        "model.backbone": "tiny", "model.proc_side": "64", "model.depth": "4",
        "model.compute_dtype": "float32", "data.source_side": "128",
    })
    monkeypatch.setattr(config_mod, "Config", lambda: tiny)

    class _NoCodec:
        def __init__(self, *a, **k):
            pass

        def isOpened(self):
            return False

    monkeypatch.setattr(cv2, "VideoWriter", _NoCodec)

    from metro_pose3d_tpu.demo import main

    out = tmp_path / "demo.mp4"
    rc = main(["--video", "3", "--out", str(out)])
    assert rc == 0
    alt = tmp_path / "demo.mp4.npz"
    assert alt.exists()
    frames = np.load(alt)["frames"]
    assert frames.shape[0] == 3 and frames.dtype == np.uint8


def test_demo_requires_boxes_with_image(tmp_path):
    import cv2

    from metro_pose3d_tpu.demo import main

    img = tmp_path / "x.jpg"
    cv2.imwrite(str(img), np.zeros((64, 64, 3), np.uint8))
    with pytest.raises(SystemExit):
        main(["--image", str(img), "--out", str(tmp_path / "o.png")])
