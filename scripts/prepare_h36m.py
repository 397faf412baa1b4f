#!/usr/bin/env python
"""Convert the official Human3.6M release into the flat layout
`metro_pose3d_tpu/data/h36m.py` reads:

    $DATA_ROOT/h36m/annotations.npz
        image_paths [N] (relative), world_coords [N,17,3] mm,
        subjects [N], frame_indices [N],
        intrinsics [N,3,3], rotations [N,3,3], positions [N,3],
        distortions [N,5]
    $DATA_ROOT/h36m/images/S<subj>/<seq>/frame_%06d.jpg

Inputs expected under $DATA_ROOT/h36m (from get_h36m.sh):
    S*/Videos/*.mp4                              (or .avi)
    S*/MyPoseFeatures/D3_Positions_mono/*.cdf    (world-mm 32-joint poses,
                                                  one file per action+camera)
    metadata.xml OR cameras.h5                   (camera calibration)

Frame extraction uses ffmpeg (every Nth frame; train step 5, test step 64 as
in the reference protocol — the builder can subsample further).

Provenance: written without access to the licensed release (empty reference
mount, SURVEY.md §0); joint subset + camera conventions follow the publicly
documented H36M toolbox layout. Parsers fail loudly with the exact missing
path/field so drift against the real release is caught on first run.
"""
from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

import numpy as np

# 32-joint official order -> the 17 MeTRo/H36M joints
# (pelv rhip rkne rank lhip lkne lank spin neck head htop lsho lelb lwri
#  rsho relb rwri) — standard H36M-17 selection used by the reference.
H36M32_TO_17 = np.array(
    [0, 1, 2, 3, 6, 7, 8, 12, 13, 14, 15, 17, 18, 19, 25, 26, 27], np.int32
)
TRAIN_SUBJECTS = (1, 5, 6, 7, 8)
TEST_SUBJECTS = (9, 11)
CAMERA_IDS = ("54138969", "55011271", "58860488", "60457274")


def load_poses_cdf(path: str) -> np.ndarray:
    """H36M pose CDF -> [F, 32, 3] millimeters."""
    try:
        import cdflib
    except ImportError:
        sys.exit("pip install cdflib to parse H36M CDF pose files")
    cdf = cdflib.CDF(path)
    data = np.asarray(cdf.varget("Pose")).reshape(-1, 32, 3)
    return data.astype(np.float64)


def world_poses_for(pose_dir_world: str, pose_dir_mono: str, action: str,
                    cam_id: str, cam: dict) -> np.ndarray:
    """World-frame [F, 32, 3] poses for one (action, camera).

    Prefers `D3_Positions/<action>.cdf` (world frame, camera-independent).
    Falls back to `D3_Positions_mono/<action>.<cam>.cdf`, which the toolbox
    exports in the CAMERA frame — converted here via world = p_cam @ R + t
    (R rows are camera axes, t the optical center; see geom/camera.py)."""
    world_path = os.path.join(pose_dir_world, f"{action}.cdf")
    if os.path.exists(world_path):
        return load_poses_cdf(world_path)
    mono_path = os.path.join(pose_dir_mono, f"{action}.{cam_id}.cdf")
    poses_cam = load_poses_cdf(mono_path)
    return poses_cam @ cam["R"] + cam["t"]


def parse_cameras_xml(path: str) -> dict:
    """metadata.xml -> {(subject, camera_id): dict(R, t, f, c, k, p)}.

    The official metadata.xml packs w0 (global parameter vector); the
    widely mirrored per-camera layout is 6 extrinsic + 9 intrinsic numbers
    per (subject, camera). Fails loudly if the structure differs.
    """
    import xml.etree.ElementTree as ET

    tree = ET.parse(path)
    w0_el = tree.getroot().find(".//w0")
    if w0_el is None:
        raise ValueError(f"{path}: no <w0> element — unexpected metadata format")
    w0 = np.fromstring(w0_el.text.strip().strip("[]"), sep=" ")
    n_subj, n_cam = 11, 4
    ext = w0[: n_subj * n_cam * 6].reshape(n_cam, n_subj, 6)
    intr = w0[n_subj * n_cam * 6 : n_subj * n_cam * 6 + n_cam * 9].reshape(n_cam, 9)
    cams = {}
    for ci, cam_id in enumerate(CAMERA_IDS):
        f = intr[ci, 0:2]
        c = intr[ci, 2:4]
        k = intr[ci, 4:7]
        p = intr[ci, 7:9]
        for subj in range(1, 12):
            rx, ry, rz, tx, ty, tz = ext[ci, subj - 1]
            cams[(subj, cam_id)] = dict(
                R=_euler_to_R(rx, ry, rz), t=np.array([tx, ty, tz]),
                f=f, c=c, k=k, p=p,
            )
    return cams


def _euler_to_R(rx, ry, rz):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    rx_m = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry_m = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz_m = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (rx_m @ ry_m @ rz_m).T  # world->cam


def extract_frames(video: str, out_dir: str, step: int) -> int:
    os.makedirs(out_dir, exist_ok=True)
    # select every `step`-th frame; output numbering matches source frame idx
    cmd = [
        "ffmpeg", "-nostdin", "-loglevel", "error", "-i", video,
        "-vf", f"select=not(mod(n\\,{step}))", "-vsync", "vfr",
        "-frame_pts", "1", "-qscale:v", "2",
        os.path.join(out_dir, "frame_%06d.jpg"),
    ]
    subprocess.run(cmd, check=True)
    return len(os.listdir(out_dir))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default=os.environ.get("DATA_ROOT", "/data"))
    ap.add_argument("--train-step", type=int, default=5)
    ap.add_argument("--test-step", type=int, default=64)
    args = ap.parse_args()
    root = os.path.join(args.data_root, "h36m")

    meta = os.path.join(root, "metadata.xml")
    if not os.path.exists(meta):
        sys.exit(f"{meta} not found (camera calibration) — see get_h36m.sh")
    cameras = parse_cameras_xml(meta)

    rows = {k: [] for k in (
        "image_paths", "world_coords", "subjects", "frame_indices",
        "intrinsics", "rotations", "positions", "distortions")}

    for subj in TRAIN_SUBJECTS + TEST_SUBJECTS:
        sdir = os.path.join(root, f"S{subj}")
        pose_dir_mono = os.path.join(sdir, "MyPoseFeatures", "D3_Positions_mono")
        pose_dir_world = os.path.join(sdir, "MyPoseFeatures", "D3_Positions")
        vid_dir = os.path.join(sdir, "Videos")
        if not os.path.isdir(pose_dir_mono) and not os.path.isdir(pose_dir_world):
            print(f"skipping S{subj}: no D3_Positions under {sdir}")
            continue
        step = args.train_step if subj in TRAIN_SUBJECTS else args.test_step
        listing = sorted(
            os.listdir(pose_dir_mono) if os.path.isdir(pose_dir_mono) else []
        )
        if not listing and os.path.isdir(pose_dir_world):
            # world-only release: iterate actions x all 4 cameras
            listing = [
                f"{f[:-4]}.{cam}.cdf"
                for f in sorted(os.listdir(pose_dir_world)) if f.endswith(".cdf")
                for cam in CAMERA_IDS
            ]
        for fname in listing:
            if not fname.endswith(".cdf"):
                continue
            m = re.match(r"(.+)\.(\d+)\.cdf", fname)
            if not m:
                continue
            action, cam_id = m.group(1), m.group(2)
            cam = cameras[(subj, cam_id)]
            poses = world_poses_for(pose_dir_world, pose_dir_mono, action,
                                    cam_id, cam)
            video = os.path.join(vid_dir, f"{action}.{cam_id}.mp4")
            if not os.path.exists(video):
                video = video[:-4] + ".avi"
            if not os.path.exists(video):
                print(f"  no video for {action}.{cam_id}, skipping")
                continue
            out_rel = os.path.join("images", f"S{subj}", f"{action}.{cam_id}")
            extract_frames(video, os.path.join(root, out_rel), step)
            K = np.array([
                [cam["f"][0], 0, cam["c"][0]],
                [0, cam["f"][1], cam["c"][1]],
                [0, 0, 1.0]])
            dist = np.array([cam["k"][0], cam["k"][1], cam["p"][0],
                             cam["p"][1], cam["k"][2]])
            for fr in range(0, len(poses), step):
                img_rel = os.path.join(out_rel, f"frame_{fr:06d}.jpg")
                if not os.path.exists(os.path.join(root, img_rel)):
                    continue
                rows["image_paths"].append(img_rel)
                rows["world_coords"].append(poses[fr][H36M32_TO_17])
                rows["subjects"].append(subj)
                rows["frame_indices"].append(fr)
                rows["intrinsics"].append(K)
                rows["rotations"].append(cam["R"])
                rows["positions"].append(cam["t"])
                rows["distortions"].append(dist)
        print(f"S{subj}: {len(rows['image_paths'])} examples so far")

    if not rows["image_paths"]:
        sys.exit("no examples produced — check the release layout")
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
    print(f"wrote {out} ({len(rows['image_paths'])} examples)")


if __name__ == "__main__":
    main()
