"""CLI entry point: train / test / eval / export dispatch.

Responsibility-parity with the reference's `./main.py` (SURVEY.md §2 L6):

  python -m metro_pose3d_tpu.main --train --data.dataset=h36m \
      --train.logdir=/tmp/run1 --train.num_steps=400000
  python -m metro_pose3d_tpu.main --test --eval.pred_path=preds.npz ...
  python -m metro_pose3d_tpu.main --eval-h36m --eval.pred_path=preds.npz
  python -m metro_pose3d_tpu.main --test-multiperson --data.dataset=3dpw ...
  python -m metro_pose3d_tpu.main --eval-truncation --data.dataset=h36m ...
  python -m metro_pose3d_tpu.main --export=model_dir ...

Config overrides use dotted flags (`--section.field=value`, see config.py);
the full config is dumped into the logdir for reproducibility.
"""
from __future__ import annotations

import sys

import jax


def _get_dataset(cfg, name):
    """Dataset from the registry, with config-reachable constructor knobs.

    The synthetic dataset is procedural, so its split sizes are config
    fields (`data.synthetic_n_train/n_test`) rather than disk facts."""
    from metro_pose3d_tpu.data import get_dataset

    kwargs = {}
    if name == "synthetic":
        kwargs = dict(n_train=cfg.data.synthetic_n_train,
                      n_test=cfg.data.synthetic_n_test)
    return get_dataset(name, cfg.data.data_root, **kwargs)


def _load_variables(cfg, dataset=None):
    import dataclasses

    from metro_pose3d_tpu.train.checkpoint import Checkpointer
    from metro_pose3d_tpu.train.loop import make_optimizer
    from metro_pose3d_tpu.train.state import create_train_state

    quantize = cfg.model.quantize
    if quantize != "none":
        # checkpoints are quantize-agnostic; the train-state template must
        # build the (train-mode) bf16 graph
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quantize="none"))
    state = create_train_state(cfg, make_optimizer(cfg))
    logdir = cfg.train.load_path or cfg.train.logdir
    state, step = Checkpointer(logdir).restore(state)
    if step == 0:
        print(f"warning: no checkpoint under {logdir}; using random init")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if quantize == "int8":
        # the int8 graph reads calibrated activation scales from the
        # "quant" collection; checkpoints don't carry it, so every
        # evaluation entry point must calibrate here (not just --export)
        # or Flax fails with an opaque missing-collection error.
        if dataset is None:
            raise ValueError(
                "model.quantize=int8 needs calibration data; this mode has "
                "no dataset to calibrate on — run --export first or use a "
                "dataset-driven mode (--test/--test-multiperson/...)"
            )
        from metro_pose3d_tpu.models.quantize import calibrate_on_dataset

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quantize=quantize))
        variables = calibrate_on_dataset(cfg, variables, dataset)
    return variables


def main(argv=None):
    from metro_pose3d_tpu.config import parse_cli

    cfg, rest = parse_cli(argv if argv is not None else sys.argv[1:])
    modes = {a for a in rest if a.startswith("--")}

    from metro_pose3d_tpu.config import apply_matmul_precision

    apply_matmul_precision(cfg)

    if "--train" in modes:
        from metro_pose3d_tpu.train.trainer import train

        dataset = _get_dataset(cfg, cfg.data.dataset)
        dataset2d = (
            _get_dataset(cfg, cfg.data.dataset_2d)
            if cfg.data.dataset_2d
            else None
        )
        train(cfg, dataset, dataset2d)
        return 0

    if "--test" in modes:
        from metro_pose3d_tpu.evaluation.predict import (
            _check_joint_count, predict_dataset, save_predictions,
        )
        from metro_pose3d_tpu.parallel.mesh import make_mesh

        dataset = _get_dataset(cfg, cfg.data.dataset)
        # before _load_variables: int8 calibration costs minutes of chip
        # time, and a skeleton mismatch must fail before it, not after
        _check_joint_count(cfg, dataset.joint_info)
        variables = _load_variables(cfg, dataset)
        result = predict_dataset(cfg, variables, dataset, mesh=make_mesh())
        path = cfg.eval.pred_path or f"{cfg.train.logdir}/predictions.npz"
        save_predictions(result, path)
        print(f"saved predictions to {path}")
        return 0

    if "--eval-h36m" in modes:
        from metro_pose3d_tpu.evaluation.eval_h36m import main as eval_main

        eval_main(["--pred-path", cfg.eval.pred_path])
        return 0

    if "--eval-3dhp" in modes:
        from metro_pose3d_tpu.evaluation.eval_3dhp import main as eval_main

        eval_main(["--pred-path", cfg.eval.pred_path])
        return 0

    if "--eval-3dpw" in modes:
        from metro_pose3d_tpu.evaluation.eval_3dpw import main as eval_main

        eval_main(["--pred-path", cfg.eval.pred_path])
        return 0

    if "--test-multiperson" in modes:
        # frame-wise multi-person prediction (BASELINE config 5, e.g. 3DPW)
        from metro_pose3d_tpu.evaluation.predict import (
            _check_joint_count, predict_multiperson_dataset, save_predictions,
        )

        dataset = _get_dataset(cfg, cfg.data.dataset)
        _check_joint_count(cfg, dataset.joint_info)  # before calibration
        result = predict_multiperson_dataset(
            cfg, _load_variables(cfg, dataset), dataset)
        path = cfg.eval.pred_path or f"{cfg.train.logdir}/predictions_mp.npz"
        save_predictions(result, path)
        print(f"saved multi-person predictions to {path}")
        return 0

    if "--eval-truncation" in modes:
        import json

        from metro_pose3d_tpu.evaluation.truncation import evaluate_truncation

        dataset = _get_dataset(cfg, cfg.data.dataset)
        table = evaluate_truncation(cfg, _load_variables(cfg, dataset), dataset)
        print(json.dumps(table, indent=2))
        return 0

    export = [a for a in rest if a.startswith("--export=")]
    if export:
        from metro_pose3d_tpu.export import export_model

        dataset = None
        if cfg.model.quantize == "int8":
            # int8 bundles ship calibrated activation scales, from the
            # dataset's deterministic eval crops (models/quantize.py)
            dataset = _get_dataset(cfg, cfg.data.dataset)
        variables = _load_variables(cfg, dataset)
        export_model(cfg, variables, export[0].split("=", 1)[1])
        return 0

    print(__doc__)
    return 1


if __name__ == "__main__":
    sys.exit(main())
