"""Truncation-robustness evaluation (the MeTRo paper's headline experiment).

Protocol (SURVEY.md §7 "Truncation robustness"): progressively cut the
person box from the bottom (the crop then covers only the top fraction of
the person) and evaluate the FULL-skeleton root-relative MPJPE at each
truncation level. A metric-scale volumetric head degrades gracefully —
joints outside the crop are still decoded at metric positions — while
image-aligned (2.5D) heads collapse, because their x/y axes cannot point
outside the crop.

Usage:
    from metro_pose3d_tpu.evaluation.truncation import evaluate_truncation
    table = evaluate_truncation(cfg, variables, dataset, fractions=(0, .2, .4))
"""
from __future__ import annotations

import numpy as np

from metro_pose3d_tpu.config import Config
from metro_pose3d_tpu.evaluation.metrics import mpjpe
from metro_pose3d_tpu.geom import boxes as boxlib


def truncate_box(bbox, fraction: float):
    """Cut `fraction` of the box height from the bottom (legs first)."""
    x, y, w, h = (float(v) for v in bbox)
    return np.array([x, y, w, h * (1.0 - fraction)])


def evaluate_truncation(
    cfg: Config,
    variables,
    dataset,
    fractions=(0.0, 0.1, 0.2, 0.3, 0.4, 0.5),
    n_examples: int | None = 64,
):
    """-> {fraction: {"mpjpe": .., "mpjpe_visible": .., "mpjpe_hidden": ..}}.

    `mpjpe_hidden` is the error over the joints that project OUTSIDE the
    truncated crop — the truncation-robustness signal; `mpjpe_visible`
    isolates the in-crop joints for comparison.
    """
    import jax

    from metro_pose3d_tpu.evaluation.engine import make_predict_fn
    from metro_pose3d_tpu.pipeline.loader import prepare_one, stack_examples

    ji = dataset.joint_info
    root = ji.names.index(dataset.root_joint)
    fn = make_predict_fn(
        cfg, ji.mirror_mapping, root_index=root, from_tiles=True,
        reconstruct=False,
    )
    n = min(n_examples or dataset.n_test, dataset.n_test)
    results = {}
    for frac in fractions:
        prepared = []
        for i in range(n):
            ex = dataset.test_example(i)
            ex.bbox = truncate_box(ex.bbox, frac)
            prepared.append(
                prepare_one(ex, ji, cfg.model.proc_side, cfg.data.source_side,
                            None, (0, 0, i), 4,
                            box_expansion=cfg.data.test_box_expansion)
            )
        batch = stack_examples(prepared)
        pred = jax.device_get(fn(variables, {k: v for k, v in batch.items()}))
        if "pose25d" in pred:
            # 2.5D baseline (model_class=twofive): lift with the GT root
            # depth, same as predict_dataset — the protocol then compares
            # both model classes on identical root-relative footing
            from metro_pose3d_tpu.evaluation.predict import lift_twofive

            lift_twofive(pred, batch, root)
        rel_pred = pred["pose3d_rootrel"]
        gt = batch["coords3d_true"]
        rel_gt = gt - gt[:, root : root + 1]
        # visible = joint projects inside the (truncated) crop
        visible = batch["joint_validity_2d"] > 0.5
        valid = batch["joint_validity"] > 0.5
        row = {
            "mpjpe": mpjpe(rel_pred, rel_gt, valid),
            "n_visible": float(visible.mean()),
        }
        if (valid & visible).any():
            row["mpjpe_visible"] = mpjpe(rel_pred, rel_gt, valid & visible)
        if (valid & ~visible).any():
            row["mpjpe_hidden"] = mpjpe(rel_pred, rel_gt, valid & ~visible)
        results[float(frac)] = row
    return results


def main(argv=None):
    import argparse
    import json

    import jax

    from metro_pose3d_tpu.config import parse_cli
    from metro_pose3d_tpu.data import get_dataset
    from metro_pose3d_tpu.train.checkpoint import Checkpointer
    from metro_pose3d_tpu.train.loop import make_optimizer
    from metro_pose3d_tpu.train.state import create_train_state

    cfg, rest = parse_cli(argv if argv is not None else [])
    dataset = get_dataset(cfg.data.dataset, cfg.data.data_root)
    state = create_train_state(cfg, make_optimizer(cfg))
    state, _ = Checkpointer(cfg.train.load_path or cfg.train.logdir).restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(json.dumps(evaluate_truncation(cfg, variables, dataset), indent=2))


if __name__ == "__main__":
    main()
