"""Test driver: deterministic crops -> fused predict (+flip TTA) -> .npz dump.

Responsibility-parity with the reference's `--test` path (SURVEY.md §4.2):
evaluation stays two-phase (dump predictions, then score offline) so protocol
scripts are decoupled from the model. Prediction itself is the fused jit
graph sharded over the data mesh; per-host loaders feed disjoint shards and
predictions gather to host.
"""
from __future__ import annotations

import functools
import os

import jax
import numpy as np

import logging

from metro_pose3d_tpu.config import Config
from metro_pose3d_tpu.evaluation.engine import make_predict_fn
from metro_pose3d_tpu.parallel.mesh import shard_batch
from metro_pose3d_tpu.pipeline.loader import batch_iterator

log = logging.getLogger("metro_tpu.predict")


def _check_joint_count(cfg: Config, joint_info) -> None:
    """Fail loud (and early) when the model head and the dataset skeleton
    disagree — e.g. the default 17-joint model on 3DPW's SMPL-24 GT. Without
    this the mismatch surfaces as an opaque broadcast error deep inside the
    flip-TTA average (found by the config-5 chip CLI rehearsal)."""
    n_ds = len(joint_info.names)
    if cfg.model.num_joints != n_ds:
        raise ValueError(
            f"model.num_joints={cfg.model.num_joints} but the dataset's "
            f"skeleton has {n_ds} joints ({joint_info.names[:3]}...). Pass "
            f"--model.num_joints={n_ds} (and a checkpoint trained on that "
            "skeleton) or evaluate on a matching dataset."
        )


def _offset_test_example(dataset, offset: int, i: int):
    """Module-level (picklable) accessor: process-pool loaders ship this
    with the dataset instead of an unpicklable closure."""
    return dataset.test_example(offset + i)


def compute_mean_bones(dataset, n_examples: int = 512) -> np.ndarray:
    """Mean bone lengths (mm) over the train split's world-space GT — the
    target skeleton for `eval.scale_recovery="bone_lengths"` (the
    reference's universal-skeleton rescale, SURVEY.md §3.2)."""
    ji = dataset.joint_info
    edges = ji.bones
    n = min(n_examples, dataset.n_train)
    acc = np.zeros(len(edges), np.float64)
    count = 0
    for i in range(n):
        w = dataset.train_example(i).world_coords
        if w is None:
            continue
        acc += np.linalg.norm(w[edges[:, 0]] - w[edges[:, 1]], axis=-1)
        count += 1
    if count == 0:
        raise ValueError("dataset has no 3D ground truth to average bones over")
    return (acc / count).astype(np.float32)


def lift_twofive(pred: dict, batch: dict, root: int) -> dict:
    """Lift a 2.5D-baseline prediction to camera-frame / root-relative mm,
    in place. (u, v, z_centered) is back-projected with the GT root depth —
    the paper convention for image-aligned baselines, and exactly the
    scale/distance dependence MeTRo's metric volume removes. Shared by
    `predict_dataset` and `evaluation.truncation.evaluate_truncation`."""
    from metro_pose3d_tpu.models.metro import twofive_backproject

    p25 = np.asarray(pred["pose25d"])
    z_rel = p25[..., 2] - p25[:, root : root + 1, 2]
    p25 = np.concatenate([p25[..., :2], z_rel[..., None]], -1)
    root_depth = batch["coords3d_true"][:, root, 2]
    abs3d = np.asarray(
        twofive_backproject(
            jax.numpy.asarray(p25),
            jax.numpy.asarray(batch["intrinsics"]),
            jax.numpy.asarray(root_depth),
        )
    )
    pred["pose3d_abs"] = abs3d
    pred["pose3d_rootrel"] = abs3d - abs3d[:, root : root + 1]
    return pred


def make_dataset_predict_fn(cfg: Config, dataset, mesh=None, mean_bones=None):
    """Build the fused predict fn for a dataset's skeleton ONCE.

    Jitting the full eval graph costs minutes at R50@256; drivers that
    predict repeatedly (periodic training validation) must build this once
    and pass it to `predict_dataset(..., predict_fn=...)` (VERDICT r1
    weak #5)."""
    ji = dataset.joint_info
    root = ji.names.index(dataset.root_joint)
    if mean_bones is None and cfg.eval.scale_recovery == "bone_lengths":
        mean_bones = compute_mean_bones(dataset)
    if jax.process_count() > 1:
        # each host drives only its addressable devices; no cross-host
        # collectives in the eval graph, so blocks stream independently
        from metro_pose3d_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(devices=jax.local_devices())
    return make_predict_fn(
        cfg, ji.mirror_mapping, root_index=root, from_tiles=True, mesh=mesh,
        bone_edges=ji.bones if mean_bones is not None else None,
        mean_bones=mean_bones,
    )


def predict_dataset(
    cfg: Config,
    variables,
    dataset,
    mesh=None,
    mean_bones=None,
    n_examples: int | None = None,
    replicate_hosts: bool = False,
    predict_fn=None,
) -> dict:
    """Run the test split; returns dict of stacked arrays (also .npz-saved
    via `save_predictions`).

    Multi-host pods: prediction runs on a per-host LOCAL mesh over a
    contiguous block of examples per host (row i of the dump = example
    `example_offset + i`, recorded in the result), so host batch counts never
    need to be synchronized mid-stream; the per-host .npz dumps concatenate
    in host order. `replicate_hosts=True` makes EVERY host run the same full
    pass instead (used by training validation so best-checkpoint decisions
    agree across processes). `predict_fn` reuses a previously built fused
    predict fn (see `make_predict_fn` args used below) to avoid re-jitting.
    """
    from metro_pose3d_tpu.config import apply_matmul_precision

    apply_matmul_precision(cfg)
    ji = dataset.joint_info
    _check_joint_count(cfg, ji)
    root = ji.names.index(dataset.root_joint)
    if jax.process_count() > 1:
        # same local-mesh override as make_dataset_predict_fn, so the batch
        # feed below shards onto the devices the fn actually runs on
        from metro_pose3d_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(devices=jax.local_devices())
    fn = predict_fn if predict_fn is not None else make_dataset_predict_fn(
        cfg, dataset, mesh=mesh, mean_bones=mean_bones
    )
    n_total = dataset.n_test if n_examples is None else min(n_examples, dataset.n_test)
    if jax.process_count() > 1 and not replicate_hosts:
        hosts = jax.process_count()
        per = -(-n_total // hosts)  # ceil: earlier hosts take the remainder
        offset = min(jax.process_index() * per, n_total)
        n = min(per, n_total - offset)
    else:
        offset, n = 0, n_total
    it = batch_iterator(
        functools.partial(_offset_test_example, dataset, offset),
        n, ji, cfg.eval.batch_size,
        cfg.model.proc_side, cfg.data.source_side, aug_cfg=None,
        shuffle=False, max_epochs=1, drop_remainder=False,
        n_workers=cfg.data.workers, box_expansion=cfg.data.test_box_expansion,
        pool_type=cfg.data.pool_type, host_prep=cfg.data.host_prep,
    )
    outs = {"pose3d_rootrel": [], "pose3d_abs": [], "pose2d_px": []}
    gts = {"gt3d_rootrel": [], "gt3d_abs": [], "valid": []}
    n_batches = -(-n // cfg.eval.batch_size)
    for batch_i, batch in enumerate(it):
        if batch_i % 20 == 0:
            log.info("predict batch %d/%d", batch_i + 1, n_batches)
        pad = batch.pop("_pad")
        dev_batch = shard_batch(batch, mesh) if mesh is not None else batch
        pred = jax.device_get(fn(variables, {k: v for k, v in dev_batch.items()}))
        keep = pad > 0.5
        if "pose25d" in pred:
            lift_twofive(pred, batch, root)
        for k in outs:
            if k in pred:
                outs[k].append(pred[k][keep])
        gt_abs = batch["coords3d_true"][keep]
        gts["gt3d_abs"].append(gt_abs)
        gts["gt3d_rootrel"].append(gt_abs - gt_abs[:, root : root + 1])
        gts["valid"].append(batch["joint_validity"][keep] > 0.5)
    result = {k: np.concatenate(v) for k, v in {**outs, **gts}.items() if v}
    if hasattr(dataset, "test_group_label"):
        # deterministic unshuffled pass -> row i is example offset+i
        result["actions"] = np.array(
            [dataset.test_group_label(offset + i) for i in range(n)]
        )
    if hasattr(dataset, "test_univ_scale"):
        # 3DHP universal-skeleton protocol: per-example scale that maps
        # root-relative GT onto the height-normalized skeleton. None means
        # the shard has no universal annotations: omit the key entirely so
        # the eval script cannot mislabel duplicate numbers as the
        # univ protocol.
        scales = [dataset.test_univ_scale(offset + i) for i in range(n)]
        # `scales and ...`: an empty slice (n=0 multi-host tail) must not
        # vacuously emit the key a legacy shard's other hosts omit
        if scales and all(s is not None for s in scales):
            result["univ_scale"] = np.array(scales, np.float32)
    result["joint_names"] = np.array(ji.names)
    result["example_offset"] = np.int64(offset)
    return result


def predict_multiperson_dataset(
    cfg: Config,
    variables,
    dataset,
    n_frames: int | None = None,
    mean_bones=None,
) -> dict:
    """Frame-wise multi-person prediction (BASELINE config 5; e.g. 3DPW).

    `dataset` must expose `n_test_frames` and
    `test_frame(i) -> (image, boxes, camera, world [P,J,3], seq)`.
    Returns the eval_3dpw dump layout (one row per person instance).
    """
    from metro_pose3d_tpu.config import apply_matmul_precision
    from metro_pose3d_tpu.multiperson import MultiPersonEstimator

    apply_matmul_precision(cfg)
    ji = dataset.joint_info
    _check_joint_count(cfg, ji)
    root = ji.names.index(dataset.root_joint)
    est = MultiPersonEstimator(
        cfg, variables, ji, root_name=dataset.root_joint,
        bone_edges=ji.bones if mean_bones is not None else None,
        mean_bones=mean_bones,
    )
    n = dataset.n_test_frames if n_frames is None else min(n_frames, dataset.n_test_frames)
    rows = {"pose3d": [], "pose3d_abs": [], "gt3d": [], "gt3d_abs": [], "seq": []}
    meta: list = []

    def gen_frames():
        for i in range(n):
            image, boxes, cam, world, seq = dataset.test_frame(i)
            meta.append((cam, world, seq, len(boxes)))
            yield image, boxes, cam

    # pipelined (estimate_stream): the generator runs ahead of the yielded
    # results by the pipeline depth, so frame i+1 ships/dispatches while
    # frame i syncs; meta[i] is always populated before result i arrives
    for i, out in enumerate(est.estimate_stream(gen_frames())):
        cam, world, seq, n_boxes = meta[i]
        gt_abs = np.stack([cam.world_to_camera(w) for w in world])
        rows["pose3d"].append(out["pose3d_rootrel"])
        rows["pose3d_abs"].append(out["pose3d_abs"])
        rows["gt3d"].append(gt_abs - gt_abs[:, root : root + 1])
        rows["gt3d_abs"].append(gt_abs)
        rows["seq"].extend([seq] * n_boxes)
    return {
        "pose3d": np.concatenate(rows["pose3d"]),
        "pose3d_abs": np.concatenate(rows["pose3d_abs"]),
        "gt3d": np.concatenate(rows["gt3d"]).astype(np.float32),
        "gt3d_abs": np.concatenate(rows["gt3d_abs"]).astype(np.float32),
        "seq": np.asarray(rows["seq"]),
    }


def save_predictions(result: dict, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **result)
    return path
