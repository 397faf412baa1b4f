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


def test_test_mode_int8_calibrates(tmp_path):
    """ADVICE r2 (medium): --test with model.quantize=int8 must calibrate
    in _load_variables — previously only --export did, and the int8 graph
    crashed on the missing 'quant' collection."""
    pred_path = tmp_path / "preds_int8.npz"
    rc = main([
        "--test", "--data.dataset=synthetic",
        "--model.backbone=tiny", "--model.proc_side=64", "--model.depth=4",
        "--model.compute_dtype=float32", "--model.quantize=int8",
        "--data.source_side=128", "--eval.batch_size=8",
        "--eval.flip_tta=false",
        f"--train.logdir={tmp_path}", f"--eval.pred_path={pred_path}",
    ])
    assert rc == 0
    data = np.load(pred_path, allow_pickle=True)
    assert np.isfinite(data["pose3d_rootrel"]).all()


def test_multiperson_int8_end_to_end(tmp_path):
    """--test-multiperson with model.quantize=int8: calibration must work
    off the 3DPW dataset's crop API (test_example) and the quantized graph
    must compose with frame-mode warp + TTA + LSQ + the eval scorer."""
    from metro_pose3d_tpu.data.synth_shard import write_synthetic_3dpw_release

    write_synthetic_3dpw_release(str(tmp_path))
    pred = tmp_path / "p_int8.npz"
    rc = main([
        "--test-multiperson", "--data.dataset=3dpw",
        f"--data.data_root={tmp_path}", f"--eval.pred_path={pred}",
        f"--train.logdir={tmp_path}/log", "--model.num_joints=24",
        "--model.backbone=tiny", "--model.proc_side=128", "--model.depth=4",
        "--model.quantize=int8",
    ])
    assert rc == 0
    data = np.load(pred, allow_pickle=True)
    assert np.isfinite(data["pose3d_abs"]).all()
    assert main(["--eval-3dpw", f"--eval.pred_path={pred}"]) == 0


def test_export_int8_calibrates_and_bundles(tmp_path):
    """--export with model.quantize=int8: calibrate on the dataset's eval
    crops, ship the quant scales in the bundle, reload and predict."""
    out = tmp_path / "bundle"
    rc = main([
        f"--export={out}", "--data.dataset=synthetic",
        "--model.backbone=tiny", "--model.proc_side=64", "--model.depth=4",
        "--model.compute_dtype=float32", "--model.quantize=int8",
        "--data.source_side=128", "--eval.batch_size=8",
        f"--train.logdir={tmp_path}",
    ])
    assert rc == 0
    from metro_pose3d_tpu.export import load_exported
    import jax
    import jax.numpy as jnp

    cfg2, loaded, fn = load_exported(str(out))
    assert cfg2.model.quantize == "int8"
    amaxes = jax.tree_util.tree_leaves(loaded["quant"])
    assert amaxes and all(float(a) > 0 for a in amaxes)
    crops = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (2, 64, 64, 3)), jnp.uint8)
    intr = jnp.tile(jnp.asarray(
        [[90.0, 0, 31.5], [0, 90.0, 31.5], [0, 0, 1]], jnp.float32)[None], (2, 1, 1))
    res = fn(loaded, crops, intr)
    assert np.isfinite(np.asarray(res["pose3d_rootrel"])).all()


def test_matmul_precision_flag_sets_global(tmp_path, capsys):
    """model.matmul_precision plumbs into jax's global default (exact
    CPU<->TPU protocol parity mode; scripts/exp_shard_parity_chip.py)."""
    import jax

    from metro_pose3d_tpu.main import main

    before = jax.config.jax_default_matmul_precision
    try:
        preds = tmp_path / "p.npz"
        n = 4
        rng = np.random.default_rng(0)
        gt = rng.normal(0, 300, (n, 17, 3)).astype(np.float32)
        np.savez(preds, pose3d_rootrel=gt + 5, gt3d_rootrel=gt,
                 actions=np.array(["Walking"] * n))
        rc = main(["--eval-h36m", f"--eval.pred_path={preds}",
                   "--model.matmul_precision=highest"])
        assert rc == 0
        assert jax.config.jax_default_matmul_precision == "highest"
    finally:
        jax.config.update("jax_default_matmul_precision", before)
