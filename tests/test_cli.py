"""CLI dispatcher (main.py): mode routing and two-phase flows."""
import json

import numpy as np
import pytest

from metro_pose3d_tpu.main import main


def test_no_mode_prints_usage_and_fails():
    assert main([]) == 1


def test_eval_h36m_mode(tmp_path, capsys):
    rng = np.random.default_rng(0)
    gt = rng.normal(0, 200, (10, 17, 3)).astype(np.float32)
    path = tmp_path / "p.npz"
    np.savez(path, pose3d_rootrel=gt + rng.normal(0, 5, gt.shape).astype(np.float32),
             gt3d_rootrel=gt)
    assert main(["--eval-h36m", f"--eval.pred_path={path}"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert 5 < out["mpjpe"] < 15


def test_eval_3dpw_mode(tmp_path, capsys):
    rng = np.random.default_rng(1)
    gt = rng.normal(0, 200, (6, 24, 3)).astype(np.float32)
    path = tmp_path / "p.npz"
    np.savez(path, pose3d=gt + 3, gt3d=gt, seq=np.array(["s"] * 6))
    assert main(["--eval-3dpw", f"--eval.pred_path={path}"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert abs(out["mpjpe"] - np.sqrt(27)) < 0.1


def test_test_mode_end_to_end(tmp_path):
    """--test on the synthetic dataset with a tiny model: full two-phase
    predict -> dump flow through the CLI, then score it."""
    pred_path = tmp_path / "preds.npz"
    rc = main([
        "--test", "--data.dataset=synthetic",
        "--model.backbone=tiny", "--model.proc_side=64", "--model.depth=4",
        "--model.compute_dtype=float32", "--data.source_side=128",
        "--eval.batch_size=8", "--eval.flip_tta=false",
        f"--train.logdir={tmp_path}", f"--eval.pred_path={pred_path}",
    ])
    assert rc == 0
    data = np.load(pred_path, allow_pickle=True)
    assert data["pose3d_rootrel"].shape[1:] == (17, 3)
    assert main(["--eval-h36m", f"--eval.pred_path={pred_path}"]) == 0
