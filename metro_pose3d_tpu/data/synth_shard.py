"""Frozen synthetic "mini-H36M" shard writer — the protocol rehearsal rig.

Writes a deterministic synthetic dataset to disk in the EXACT layout
`scripts/prepare_h36m.py` emits (JPEG frames + annotations.npz), so the whole
licensed-data chain — prepare-script layout -> `data/h36m.py` builder ->
loader -> `--test` (TTA + reconstruction + bone rescale) -> `eval_h36m`
per-action table — can be exercised end-to-end TODAY, without H36M access
(VERDICT r1 missing #2; SURVEY.md §5.2 protocol tests).

Scenes come from `data.synthetic.make_example` (closed-form GT), re-expressed
in an H36M-style z-UP world with a non-trivial camera extrinsic per sequence,
so the builder's world->camera math is genuinely exercised. Sequence names
deliberately include the release's spelling variants ("WalkDog",
"TakingPhoto", "WalkingTogether") to exercise action canonicalization.
"""
from __future__ import annotations

import os

import numpy as np

from metro_pose3d_tpu.data.synthetic import make_example

# (subject, action.camera sequence name, frame step): S1 is a train subject
# (sampled every 5th frame), S9/S11 are protocol-2 test subjects (every 64th).
DEFAULT_SEQUENCES = (
    (1, "Walking 1.54138969", 5),
    (1, "Eating.55011271", 5),
    (9, "Walking 1.58860488", 64),
    (9, "WalkDog.54138969", 64),
    (9, "Greeting.60457274", 64),
    (11, "TakingPhoto.55011271", 64),
    (11, "WalkingTogether 1.58860488", 64),
)

# Fixed base orientation: world z-up, camera looking along world +y with
# image y pointing world-down (rows = camera axes expressed in world).
_R_BASE = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])


def _rz(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def write_synthetic_h36m_shard(
    data_root: str,
    sequences=DEFAULT_SEQUENCES,
    frames_per_sequence: int = 4,
    seed: int = 0,
    imshape=(512, 512),
    jpeg_quality: int = 95,
) -> str:
    """Write the shard under `data_root`/h36m; returns the annotations path.

    Every call with the same arguments produces byte-identical files (the
    scene generator and the JPEG encoder are deterministic), so protocol
    goldens pinned on this shard are stable.
    """
    import cv2

    root = os.path.join(data_root, "h36m")
    rows = {k: [] for k in (
        "image_paths", "world_coords", "subjects", "frame_indices",
        "intrinsics", "rotations", "positions", "distortions")}

    scene_idx = 0
    for seq_i, (subj, seq_name, step) in enumerate(sequences):
        # per-sequence camera pose in the z-up world: yaw about world-z keeps
        # crops upright while making every extrinsic distinct
        yaw = (seq_i * 2.399963)  # golden-angle spacing, deterministic
        r_wc = _R_BASE @ _rz(-yaw)
        center = np.array(
            [1500.0 * np.cos(yaw), 1500.0 * np.sin(yaw), 1200.0 + 100.0 * seq_i]
        )
        out_rel = os.path.join("images", f"S{subj}", seq_name)
        os.makedirs(os.path.join(root, out_rel), exist_ok=True)
        for k in range(frames_per_sequence):
            ex = make_example(scene_idx, seed=seed, imshape=imshape)
            scene_idx += 1
            # make_example's camera is at the origin with identity rotation,
            # so its world coords ARE camera-frame points; re-express them in
            # the z-up shard world:  w = R^T p_cam + C
            p_cam = ex.world_coords
            world = p_cam @ r_wc + center  # (R^T p)_i = p @ R row-major
            fr = k * step
            img_rel = os.path.join(out_rel, f"frame_{fr:06d}.jpg")
            ok = cv2.imwrite(
                os.path.join(root, img_rel), ex.image[..., ::-1],
                [int(cv2.IMWRITE_JPEG_QUALITY), jpeg_quality],
            )
            if not ok:
                raise IOError(f"could not write {img_rel}")
            rows["image_paths"].append(img_rel)
            rows["world_coords"].append(world)
            rows["subjects"].append(subj)
            rows["frame_indices"].append(fr)
            rows["intrinsics"].append(ex.camera.K)
            rows["rotations"].append(r_wc)
            rows["positions"].append(center)
            rows["distortions"].append(np.zeros(5))

    out = os.path.join(root, "annotations.npz")
    np.savez_compressed(
        out,
        image_paths=np.array(rows["image_paths"]),
        world_coords=np.array(rows["world_coords"], np.float32),
        subjects=np.array(rows["subjects"], np.int32),
        frame_indices=np.array(rows["frame_indices"], np.int32),
        intrinsics=np.array(rows["intrinsics"], np.float32),
        rotations=np.array(rows["rotations"], np.float32),
        positions=np.array(rows["positions"], np.float32),
        distortions=np.array(rows["distortions"], np.float32),
    )
    return out


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--frames-per-sequence", type=int, default=4)
    args = ap.parse_args()
    path = write_synthetic_h36m_shard(
        args.data_root, frames_per_sequence=args.frames_per_sequence
    )
    print(f"wrote {path}")
