#!/usr/bin/env python
"""Convert the official MPI-INF-3DHP release into the flat layout
`metro_pose3d_tpu/data/mpi_inf_3dhp.py` reads:

    $DATA_ROOT/3dhp/annotations_train.npz
    $DATA_ROOT/3dhp/annotations_test.npz
        image_paths [N], world_coords [N,17,3] mm, valid [N] bool,
        intrinsics [N,3,3], rotations [N,3,3], positions [N,3],
        mask_paths [N] ('' when absent), univ_scale [N] +
        activities [N] (test only)
    $DATA_ROOT/3dhp/frames/...  (ffmpeg-extracted)

Official inputs (get_3dhp.sh):
    S1..S8/Seq1,Seq2/annot.mat                (28-joint annot3 per camera)
    S1..S8/Seq1,Seq2/camera.calibration       (text blocks per camera)
    S1..S8/Seq1,Seq2/imageSequence/video_<c>.avi
    S1..S8/Seq1,Seq2/FGmasks/video_<c>.avi    (green-screen masks as video)
    mpi_inf_3dhp_test_set/TS1..TS6/annot_data.mat + imageSequence/...

Train uses the chest-height cameras (0,1,2,4,5,6,7,8) like the reference;
joints reduce 28 -> 17 via data.mpi_inf_3dhp.ANNOT28_TO_17.

Provenance: written blind against the publicly documented release layout
(empty reference mount, SURVEY.md §0); parsers fail loudly on drift.
"""
from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from metro_pose3d_tpu.data.mpi_inf_3dhp import ANNOT28_TO_17, CHEST_HEIGHT_CAMERAS

TRAIN_SUBJECTS = tuple(range(1, 9))
FRAME_STEP = 5


def parse_calibration(path: str) -> dict:
    """camera.calibration text file -> {camera_index: (K, R, t_worldpos_mm)}.

    Block format per camera (official release):
        name      <idx>
        intrinsic <16 floats, row-major 4x4>
        extrinsic <16 floats, row-major 4x4 world->cam, translation mm>
    """
    cams = {}
    name = None
    K = ext = None
    for line in open(path):
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "name":
            name = int(parts[1])
        elif parts[0] == "intrinsic":
            vals = np.array([float(v) for v in parts[1:]]).reshape(4, 4)
            K = vals[:3, :3]
        elif parts[0] == "extrinsic":
            ext = np.array([float(v) for v in parts[1:]]).reshape(4, 4)
            R = ext[:3, :3]
            t_cam = ext[:3, 3]
            cams[name] = (K, R, -R.T @ t_cam)  # optical center, world mm
    if not cams:
        raise ValueError(f"no camera blocks parsed from {path}")
    return cams


def extract_frames(video: str, out_dir: str, step: int):
    os.makedirs(out_dir, exist_ok=True)
    if os.listdir(out_dir):
        return  # already extracted
    subprocess.run(
        ["ffmpeg", "-nostdin", "-loglevel", "error", "-i", video,
         "-vf", f"select=not(mod(n\\,{step}))", "-vsync", "vfr",
         "-frame_pts", "1", "-qscale:v", "2",
         os.path.join(out_dir, "frame_%06d.jpg")],
        check=True,
    )


def prepare_train(root: str):
    from scipy.io import loadmat

    rows = {k: [] for k in ("image_paths", "world_coords", "valid",
                            "intrinsics", "rotations", "positions",
                            "mask_paths")}
    for subj in TRAIN_SUBJECTS:
        for seq in ("Seq1", "Seq2"):
            sdir = os.path.join(root, f"S{subj}", seq)
            annot_path = os.path.join(sdir, "annot.mat")
            if not os.path.exists(annot_path):
                print(f"skip S{subj}/{seq}: no annot.mat")
                continue
            annot = loadmat(annot_path)
            calib = parse_calibration(os.path.join(sdir, "camera.calibration"))
            for cam in CHEST_HEIGHT_CAMERAS:
                # annot3: per-camera cell, [F, 28*3] world? NO — annot3 is
                # CAMERA-frame mm; univ_annot3 the height-normalized variant.
                a3 = np.asarray(annot["annot3"][cam][0]).reshape(-1, 28, 3)
                K, R, pos = calib[cam]
                video = os.path.join(sdir, "imageSequence", f"video_{cam}.avi")
                if not os.path.exists(video):
                    print(f"  skip cam {cam}: no video")
                    continue
                rel = os.path.join("frames", f"S{subj}", seq, f"cam{cam}")
                extract_frames(video, os.path.join(root, rel), FRAME_STEP)
                mask_video = os.path.join(sdir, "FGmasks", f"video_{cam}.avi")
                mask_rel = ""
                if os.path.exists(mask_video):
                    mask_rel = os.path.join("frames", f"S{subj}", seq, f"mask{cam}")
                    extract_frames(mask_video, os.path.join(root, mask_rel), FRAME_STEP)
                for fr in range(0, len(a3), FRAME_STEP):
                    img = os.path.join(rel, f"frame_{fr:06d}.jpg")
                    if not os.path.exists(os.path.join(root, img)):
                        continue
                    cam_coords = a3[fr][ANNOT28_TO_17]
                    # camera-frame -> world (builder stores world + camera)
                    world = cam_coords @ R + pos
                    rows["image_paths"].append(img)
                    rows["world_coords"].append(world)
                    rows["valid"].append(True)
                    rows["intrinsics"].append(K)
                    rows["rotations"].append(R)
                    rows["positions"].append(pos)
                    m = (os.path.join(mask_rel, f"frame_{fr:06d}.jpg")
                         if mask_rel else "")
                    rows["mask_paths"].append(
                        m if m and os.path.exists(os.path.join(root, m)) else "")
            print(f"S{subj}/{seq}: {len(rows['image_paths'])} rows so far")
    return rows


def prepare_test(root: str):
    from scipy.io import loadmat

    from metro_pose3d_tpu.data.mpi_inf_3dhp import ACTIVITY_NAMES

    rows = {k: [] for k in ("image_paths", "world_coords", "valid",
                            "intrinsics", "rotations", "positions",
                            "mask_paths", "univ_scale", "activities")}
    test_root = None
    for cand in ("mpi_inf_3dhp_test_set", "test"):
        if os.path.isdir(os.path.join(root, cand)):
            test_root = os.path.join(root, cand)
            break
    if test_root is None:
        print("no test set directory found; skipping test split")
        return rows
    for ts in sorted(os.listdir(test_root)):
        if not re.match(r"TS\d+", ts):
            continue
        tdir = os.path.join(test_root, ts)
        data = loadmat(os.path.join(tdir, "annot_data.mat"))
        # annot3/univ_annot3: [F,1,17,3] camera-frame mm (test annotation is
        # already 17-joint in the official protocol ordering)
        a3 = np.asarray(data["annot3"]).reshape(-1, 17, 3)
        univ = np.asarray(data["univ_annot3"]).reshape(-1, 17, 3)
        valid = np.asarray(data["valid_frame"]).reshape(-1).astype(bool)
        # per-frame activity class 1..7 -> protocol activity name (the
        # per-activity PCK table of the official evaluation); absent in
        # some re-releases -> empty labels (table simply omitted downstream)
        if "activity_annotation" in data:
            act_ids = np.asarray(data["activity_annotation"]).reshape(-1).astype(int)
            acts = [ACTIVITY_NAMES[i - 1] if 1 <= i <= len(ACTIVITY_NAMES)
                    else "unknown" for i in act_ids]
        else:
            acts = [""] * len(a3)
        # official test intrinsics (publicly documented): f=7.32506e+02...
        # stored per-set when available, else the standard test-camera K
        K = np.array([[1497.693, 0, 1024.704],
                      [0, 1497.103, 1051.394], [0, 0, 1]])
        for fr in range(len(a3)):
            img = os.path.join(os.path.relpath(tdir, root), "imageSequence",
                               f"img_{fr + 1:06d}.jpg")
            if not os.path.exists(os.path.join(root, img)):
                continue
            scale = (np.linalg.norm(univ[fr], axis=-1).sum()
                     / max(np.linalg.norm(a3[fr], axis=-1).sum(), 1e-6))
            rows["image_paths"].append(img)
            rows["world_coords"].append(a3[fr])  # camera frame == world (R=I)
            rows["valid"].append(bool(valid[fr]))
            rows["intrinsics"].append(K)
            rows["rotations"].append(np.eye(3))
            rows["positions"].append(np.zeros(3))
            rows["mask_paths"].append("")
            rows["univ_scale"].append(scale)
            rows["activities"].append(acts[fr])
        print(f"{ts}: {valid.sum()} valid frames")
    return rows


def _save(root, fname, rows):
    if not rows["image_paths"]:
        print(f"nothing to save for {fname}")
        return
    arrays = {
        "image_paths": np.array(rows["image_paths"]),
        "world_coords": np.array(rows["world_coords"], np.float32),
        "valid": np.array(rows["valid"], bool),
        "intrinsics": np.array(rows["intrinsics"], np.float32),
        "rotations": np.array(rows["rotations"], np.float32),
        "positions": np.array(rows["positions"], np.float32),
        "mask_paths": np.array(rows["mask_paths"]),
    }
    if "univ_scale" in rows and rows["univ_scale"]:
        arrays["univ_scale"] = np.array(rows["univ_scale"], np.float32)
    if "activities" in rows and rows["activities"]:
        arrays["activities"] = np.array(rows["activities"])
    out = os.path.join(root, fname)
    np.savez_compressed(out, **arrays)
    print(f"wrote {out} ({len(rows['image_paths'])} examples)")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default=os.environ.get("DATA_ROOT", "/data"))
    args = ap.parse_args()
    root = os.path.join(args.data_root, "3dhp")
    _save(root, "annotations_train.npz", prepare_train(root))
    _save(root, "annotations_test.npz", prepare_test(root))


if __name__ == "__main__":
    main()
