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


def _render_fg_mask(ex, imshape) -> np.ndarray:
    """Foreground mask for a synthetic scene: the joint discs, white on
    black (a stand-in for the 3DHP green-screen FGmasks). Slightly dilated
    so JPEG ringing at disc edges stays inside the mask."""
    import cv2

    h, w = imshape
    mask = np.zeros((h, w), np.uint8)
    px = ex.camera.world_to_image(ex.world_coords)
    depth = float(np.mean(ex.world_coords[:, 2]))
    radius = max(2, int(180 / depth * ex.camera.K[0, 0] / 55)) + 3
    for p in px:
        if np.all(np.isfinite(p)):
            cv2.circle(mask, (int(round(p[0])), int(round(p[1]))), radius,
                       255, -1)
    return mask


def write_synthetic_3dhp_shard(
    data_root: str,
    train_sequences=((1, "Seq1", (0, 2)), (2, "Seq1", (1, 5))),
    test_sets=("TS1", "TS2"),
    frames_per_camera: int = 3,
    frames_per_test_set: int = 6,
    seed: int = 1,
    imshape=(512, 512),
    jpeg_quality: int = 95,
) -> str:
    """Write a deterministic mini-3DHP under `data_root`/3dhp in the EXACT
    layout `scripts/prepare_3dhp.py` emits (VERDICT r2 next-round #1):

      frames/S{s}/{seq}/cam{c}/frame_%06d.jpg   (step-5 numbering)
      frames/S{s}/{seq}/mask{c}/frame_%06d.jpg  (green-screen FG masks)
      mpi_inf_3dhp_test_set/TS{n}/imageSequence/img_%06d.jpg (1-indexed)
      annotations_train.npz / annotations_test.npz

    Train rows carry masks (exercising the background-replacement chain
    from disk); test rows carry activities + univ_scale (exercising the
    per-activity PCK table and the universal-skeleton rescale) and a few
    deliberately invalid frames (exercising the valid-frame filter).
    Byte-deterministic for fixed arguments.
    """
    import cv2

    root = os.path.join(data_root, "3dhp")
    keys = ("image_paths", "world_coords", "valid", "intrinsics",
            "rotations", "positions", "mask_paths")
    train = {k: [] for k in keys}
    scene_idx = 0
    seq_i = 0
    for subj, seq, cams in train_sequences:
        for cam_idx in cams:
            yaw = seq_i * 2.399963
            seq_i += 1
            r_wc = _R_BASE @ _rz(-yaw)
            center = np.array(
                [1400.0 * np.cos(yaw), 1400.0 * np.sin(yaw), 1000.0 + 90.0 * seq_i]
            )
            img_rel = os.path.join("frames", f"S{subj}", seq, f"cam{cam_idx}")
            mask_rel = os.path.join("frames", f"S{subj}", seq, f"mask{cam_idx}")
            os.makedirs(os.path.join(root, img_rel), exist_ok=True)
            os.makedirs(os.path.join(root, mask_rel), exist_ok=True)
            for k in range(frames_per_camera):
                ex = make_example(scene_idx, seed=seed, imshape=imshape)
                scene_idx += 1
                world = ex.world_coords @ r_wc + center
                fr = k * 5  # prepare_3dhp FRAME_STEP naming
                img_path = os.path.join(img_rel, f"frame_{fr:06d}.jpg")
                mask_path = os.path.join(mask_rel, f"frame_{fr:06d}.jpg")
                ok = cv2.imwrite(
                    os.path.join(root, img_path), ex.image[..., ::-1],
                    [int(cv2.IMWRITE_JPEG_QUALITY), jpeg_quality])
                ok &= cv2.imwrite(
                    os.path.join(root, mask_path), _render_fg_mask(ex, imshape),
                    [int(cv2.IMWRITE_JPEG_QUALITY), jpeg_quality])
                if not ok:
                    raise IOError(f"could not write {img_path}")
                train["image_paths"].append(img_path)
                train["world_coords"].append(world)
                train["valid"].append(True)
                train["intrinsics"].append(ex.camera.K)
                train["rotations"].append(r_wc)
                train["positions"].append(center)
                train["mask_paths"].append(mask_path)
    np.savez_compressed(
        os.path.join(root, "annotations_train.npz"),
        image_paths=np.array(train["image_paths"]),
        world_coords=np.array(train["world_coords"], np.float32),
        valid=np.array(train["valid"], bool),
        intrinsics=np.array(train["intrinsics"], np.float32),
        rotations=np.array(train["rotations"], np.float32),
        positions=np.array(train["positions"], np.float32),
        mask_paths=np.array(train["mask_paths"]),
    )

    from metro_pose3d_tpu.data.mpi_inf_3dhp import ACTIVITY_NAMES

    test = {k: [] for k in keys + ("univ_scale", "activities")}
    for ts_i, ts in enumerate(test_sets):
        rel = os.path.join("mpi_inf_3dhp_test_set", ts, "imageSequence")
        os.makedirs(os.path.join(root, rel), exist_ok=True)
        for k in range(frames_per_test_set):
            ex = make_example(scene_idx, seed=seed + 500, imshape=imshape)
            scene_idx += 1
            img_path = os.path.join(rel, f"img_{k + 1:06d}.jpg")
            ok = cv2.imwrite(
                os.path.join(root, img_path), ex.image[..., ::-1],
                [int(cv2.IMWRITE_JPEG_QUALITY), jpeg_quality])
            if not ok:
                raise IOError(f"could not write {img_path}")
            test["image_paths"].append(img_path)
            # test annotations are camera-frame (R = I), like the release
            test["world_coords"].append(ex.world_coords)
            test["valid"].append(k % 5 != 4)  # some officially-skipped frames
            test["intrinsics"].append(ex.camera.K)
            test["rotations"].append(np.eye(3))
            test["positions"].append(np.zeros(3))
            test["mask_paths"].append("")
            test["univ_scale"].append(0.9 + 0.02 * ((ts_i * 7 + k) % 6))
            test["activities"].append(
                ACTIVITY_NAMES[(ts_i * 3 + k) % len(ACTIVITY_NAMES)])
    np.savez_compressed(
        os.path.join(root, "annotations_test.npz"),
        image_paths=np.array(test["image_paths"]),
        world_coords=np.array(test["world_coords"], np.float32),
        valid=np.array(test["valid"], bool),
        intrinsics=np.array(test["intrinsics"], np.float32),
        rotations=np.array(test["rotations"], np.float32),
        positions=np.array(test["positions"], np.float32),
        mask_paths=np.array(test["mask_paths"]),
        univ_scale=np.array(test["univ_scale"], np.float32),
        activities=np.array(test["activities"]),
    )
    return os.path.join(root, "annotations_test.npz")


def write_synthetic_mpii_release(
    data_root: str, n_images: int = 6, seed: int = 2, imshape=(360, 480),
    jpeg_quality: int = 95,
) -> str:
    """Write a deterministic mini-MPII under `data_root`/mpii in the OFFICIAL
    release layout (VERDICT r2 next-round #9): images/*.jpg plus a
    mpii_human_pose_v1_u12_1.mat whose RELEASE struct walk matches what
    `scripts/prepare_mpii.py` parses (annolist[i].image.name,
    .annorect[].annopoints.point[].{id,x,y,is_visible}, .objpos, .scale,
    img_train) — so the prepare script itself is exercisable without the
    licensed tarball. Includes a test image (skipped), a rect without
    annopoints (skipped), and an under-annotated rect (skipped).
    """
    import cv2
    from scipy.io import savemat

    root = os.path.join(data_root, "mpii")
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.default_rng(seed)
    h, w = imshape

    def make_points(coords, valid):
        pts = []
        for j, (xy, v) in enumerate(zip(coords, valid)):
            if not v:
                continue
            pts.append({"id": float(j), "x": float(xy[0]), "y": float(xy[1]),
                        "is_visible": "1" if j % 3 else "0"})
        return np.array(pts, dtype=object)

    annolist = []
    img_train = []
    for i in range(n_images):
        name = f"{1000 + i:09d}.jpg"
        img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        coords = np.stack([rng.uniform(40, w - 40, 16),
                           rng.uniform(40, h - 40, 16)], -1)
        for xy in coords:
            cv2.circle(img, (int(xy[0]), int(xy[1])), 4,
                       tuple(int(v) for v in rng.integers(100, 255, 3)), -1)
        if not cv2.imwrite(os.path.join(root, "images", name), img[..., ::-1],
                           [int(cv2.IMWRITE_JPEG_QUALITY), jpeg_quality]):
            raise IOError(name)
        valid = rng.random(16) > 0.15
        center = coords[valid].mean(0)
        rect = {
            "annopoints": {"point": make_points(coords, valid)},
            "objpos": {"x": float(center[0]), "y": float(center[1])},
            "scale": float(rng.uniform(0.8, 1.6)),
        }
        rects = [rect]
        if i == 1:  # second person on the same frame, box from joint extent
            c2 = np.stack([rng.uniform(40, w - 40, 16),
                           rng.uniform(40, h - 40, 16)], -1)
            rects.append({"annopoints": {"point": make_points(c2, np.ones(16, bool))}})
        if i == 2:  # detector-style rect without annotations -> skipped
            rects.append({"objpos": {"x": 10.0, "y": 10.0}, "scale": 1.0})
        if i == 3:  # under-annotated rect (1 joint) -> skipped
            one = np.zeros(16, bool)
            one[0] = True
            rects.append({"annopoints": {"point": make_points(coords, one)},
                          "objpos": {"x": 5.0, "y": 5.0}, "scale": 0.5})
        annolist.append({"image": {"name": name},
                         "annorect": np.array(rects, dtype=object)})
        img_train.append(1)
    # one withheld test image (img_train == 0) that must not be parsed
    annolist.append({"image": {"name": "nonexistent_test.jpg"}})
    img_train.append(0)

    mat_path = os.path.join(root, "mpii_human_pose_v1_u12_1.mat")
    savemat(mat_path, {"RELEASE": {
        "annolist": np.array(annolist, dtype=object),
        "img_train": np.array(img_train, np.int64),
    }})
    return mat_path


# SMPL-24 upright-person template (meters relative to the pelvis), in the
# package's SMPL_24 joint order (geom/joints.py): per-joint height above the
# pelvis and lateral offset. Used to fabricate plausibly articulated people
# whose skeleton-derived `world_up` (data/tdpw._sequence_up) is recoverable.
_SMPL_UP_M = np.array(
    [0.0, -0.05, -0.05, 0.15, -0.45, -0.45, 0.3, -0.85, -0.85, 0.45,
     -0.9, -0.9, 0.55, 0.5, 0.5, 0.7, 0.5, 0.5, 0.25, 0.25,
     0.0, 0.0, -0.05, -0.05])
_SMPL_X_M = np.array(
    [0.0, 0.1, -0.1, 0.0, 0.1, -0.1, 0.0, 0.1, -0.1, 0.0,
     0.12, -0.12, 0.0, 0.08, -0.08, 0.0, 0.2, -0.2, 0.3, -0.3,
     0.35, -0.35, 0.38, -0.38])


def write_synthetic_3dpw_release(
    data_root: str,
    seed: int = 3,
    imshape=(600, 800),
    jpeg_quality: int = 95,
) -> str:
    """Write a deterministic mini release in the official 3DPW layout.

    Exactly what `scripts/get_3dpw.sh` leaves on disk and `data/tdpw.py`
    parses: `3dpw/sequenceFiles/test/<seq>.pkl` (python-2-era pickles with
    jointPositions [F,72] world METERS per actor, cam_poses [F,4,4]
    world->cam, shared cam_intrinsics, campose_valid) plus
    `3dpw/imageFiles/<seq>/image_%05d.jpg`. Two test sequences, two actors
    each; the second sequence carries a non-identity extrinsic so the
    world->camera math is genuinely exercised, and one actor-frame PER
    SEQUENCE is marked campose-invalid (two total) to exercise the
    validity filter. Byte-stable for fixed arguments, so
    multiperson-protocol goldens pinned on it hold.
    """
    import pickle

    import cv2

    root = os.path.join(data_root, "3dpw")
    rng = np.random.default_rng(seed)
    h, w = imshape
    intr = np.array([[800.0, 0.0, w / 2.0], [0.0, 800.0, h / 2.0], [0.0, 0.0, 1.0]])
    # y-DOWN (CV-convention) world, like the release's near-camera frame:
    # "above the pelvis" is NEGATIVE y
    skel = np.stack([_SMPL_X_M, -_SMPL_UP_M, np.zeros(24)], axis=-1)

    # (sequence name, n_actors, n_frames, camera yaw about world-y [rad])
    sequences = (
        ("courtyard_synthA_00", 2, 3, 0.0),
        ("downtown_synthB_00", 2, 3, 0.18),
    )
    for seq_name, n_actors, n_frames, yaw in sequences:
        seq_dir = os.path.join(root, "sequenceFiles", "test")
        img_dir = os.path.join(root, "imageFiles", seq_name)
        os.makedirs(seq_dir, exist_ok=True)
        os.makedirs(img_dir, exist_ok=True)

        c, s = np.cos(yaw), np.sin(yaw)
        r = np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])
        t = np.array([0.05, -0.02, 0.1]) if yaw else np.zeros(3)
        cam_pose = np.eye(4)
        cam_pose[:3, :3] = r
        cam_pose[:3, 3] = t
        cam_poses = np.tile(cam_pose, (n_frames, 1, 1))

        joints, valids = [], []
        for a in range(n_actors):
            base_cam = np.array([(a - (n_actors - 1) / 2.0) * 1.3, 0.25, 3.6])
            jp_world = np.zeros((n_frames, 24, 3))
            for f in range(n_frames):
                drift = np.array([0.08 * f * (1.0 if a == 0 else -1.0), 0.0, 0.1 * f])
                p_cam = base_cam + drift + skel + rng.normal(0, 0.02, (24, 3))
                # p_world = R^T (p_cam - t); row-major: (R^T p)_i == p @ R
                jp_world[f] = (p_cam - t) @ r
            joints.append(jp_world.reshape(n_frames, 72))
            valids.append(np.ones(n_frames))
        valids[-1][1] = 0.0  # actor 1 campose-invalid in frame 1

        with open(os.path.join(seq_dir, seq_name + ".pkl"), "wb") as f:
            pickle.dump(
                {
                    "sequence": seq_name,
                    "jointPositions": joints,
                    "campose_valid": valids,
                    "cam_poses": cam_poses,
                    "cam_intrinsics": intr,
                },
                f,
                protocol=2,
            )

        for fidx in range(n_frames):
            img = np.full((h, w, 3), 96, np.uint8)
            for a in range(n_actors):
                jw = joints[a].reshape(n_frames, 24, 3)[fidx]
                p_cam = jw @ r.T + t  # p_cam = R p_world + t (row-major)
                px = (p_cam[:, :2] / p_cam[:, 2:3]) * intr[0, 0] + intr[:2, 2]
                for j, p in enumerate(px):
                    color = (int(40 + (17 * j) % 200), int(60 + (29 * j) % 180),
                             int(50 + (41 * j) % 190))
                    cv2.circle(img, (int(round(p[0])), int(round(p[1]))),
                               9, color, -1)
            ok = cv2.imwrite(
                os.path.join(img_dir, f"image_{fidx:05d}.jpg"),
                img[..., ::-1],
                [int(cv2.IMWRITE_JPEG_QUALITY), jpeg_quality],
            )
            if not ok:
                raise IOError(f"could not write {seq_name} frame {fidx}")
    return root


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--frames-per-sequence", type=int, default=4)
    ap.add_argument("--dataset", choices=("h36m", "3dhp", "3dpw"), default="h36m")
    args = ap.parse_args()
    if args.dataset == "3dhp":
        path = write_synthetic_3dhp_shard(args.data_root)
    elif args.dataset == "3dpw":
        path = write_synthetic_3dpw_release(args.data_root)
    else:
        path = write_synthetic_h36m_shard(
            args.data_root, frames_per_sequence=args.frames_per_sequence
        )
    print(f"wrote {path}")
