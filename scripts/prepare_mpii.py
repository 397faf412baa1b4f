#!/usr/bin/env python
"""Convert the official MPII annotations into the flat layout
`metro_pose3d_tpu/data/mpii.py` reads:

    $DATA_ROOT/mpii/annotations.npz
        image_paths [N], coords2d [N,16,2] px, valid [N,16] bool, bboxes [N,4]
    $DATA_ROOT/mpii/images/*.jpg   (from the official tarball)

Input: mpii_human_pose_v1_u12_1.mat (RELEASE struct, from get_mpii.sh).
Only training images with head-annotated person rectangles are used (test
annotations are withheld). Person boxes follow the dataset's objpos+scale
convention (scale * 200 px reference height).

Provenance: written blind against the publicly documented RELEASE struct
(empty reference mount, SURVEY.md §0); the struct walk fails loudly on drift.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

N_JOINTS = 16  # official MPII joint ids 0..15 (r ankle ... l wrist)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default=os.environ.get("DATA_ROOT", "/data"))
    args = ap.parse_args()
    root = os.path.join(args.data_root, "mpii")
    mat_path = os.path.join(root, "mpii_human_pose_v1_u12_1.mat")
    if not os.path.exists(mat_path):
        sys.exit(f"{mat_path} not found — run get_mpii.sh first")

    from scipy.io import loadmat

    release = loadmat(mat_path, struct_as_record=False, squeeze_me=True)["RELEASE"]
    annolist = release.annolist
    img_train = np.atleast_1d(release.img_train)

    rows = {k: [] for k in ("image_paths", "coords2d", "valid", "bboxes")}
    for i, anno in enumerate(np.atleast_1d(annolist)):
        if not img_train[i]:
            continue
        try:
            name = anno.image.name
        except AttributeError:
            continue
        rects = np.atleast_1d(getattr(anno, "annorect", []))
        for rect in rects:
            points = getattr(getattr(rect, "annopoints", None), "point", None)
            if points is None:
                continue
            coords = np.full((N_JOINTS, 2), np.nan)
            valid = np.zeros(N_JOINTS, bool)
            for p in np.atleast_1d(points):
                j = int(p.id)
                if 0 <= j < N_JOINTS:
                    coords[j] = (float(p.x), float(p.y))
                    vis = getattr(p, "is_visible", 1)
                    # is_visible may be '', '0', '1', 0, 1 — treat only
                    # explicit 0 as "annotated but invisible" (still a valid
                    # training target in the standard protocol)
                    valid[j] = True
            if valid.sum() < 2:
                continue
            # person box from objpos + scale (200 px reference height)
            try:
                cx, cy = float(rect.objpos.x), float(rect.objpos.y)
                side = float(rect.scale) * 200.0
                bbox = [cx - side / 2, cy - side / 2, side, side]
            except AttributeError:
                lo = np.nanmin(coords, 0)
                hi = np.nanmax(coords, 0)
                pad = 0.25 * (hi - lo).max()
                bbox = [lo[0] - pad, lo[1] - pad,
                        (hi - lo)[0] + 2 * pad, (hi - lo)[1] + 2 * pad]
            rows["image_paths"].append(os.path.join("images", str(name)))
            rows["coords2d"].append(np.nan_to_num(coords))
            rows["valid"].append(valid)
            rows["bboxes"].append(bbox)

    if not rows["image_paths"]:
        sys.exit("no examples parsed — RELEASE struct drift?")
    out = os.path.join(root, "annotations.npz")
    np.savez_compressed(
        out,
        image_paths=np.array(rows["image_paths"]),
        coords2d=np.array(rows["coords2d"], np.float32),
        valid=np.array(rows["valid"], bool),
        bboxes=np.array(rows["bboxes"], np.float32),
    )
    print(f"wrote {out} ({len(rows['image_paths'])} person instances)")


if __name__ == "__main__":
    main()
