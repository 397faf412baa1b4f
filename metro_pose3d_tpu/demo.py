"""Demo: image(+boxes) -> 3D skeletons, rendered to a PNG.

Responsibility-parity with the reference's README demo snippet
(SURVEY.md §3 "Export / demo"): load a model (exported bundle, training
logdir, or random init), estimate every person in a frame, draw the 2D
overlay and a 3D view.

    python -m metro_pose3d_tpu.demo --out=/tmp/demo.png                # synthetic
    python -m metro_pose3d_tpu.demo --image=frame.jpg \
        --boxes="100,50,200,400;350,60,180,390" \
        --bundle=/path/exported --out=/tmp/demo.png
    python -m metro_pose3d_tpu.demo --video=60 --out=/tmp/demo.mp4     # stream
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def draw_demo(image, results, joint_info, out_path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 6))
    ax2d = fig.add_subplot(1, 2, 1)
    ax3d = fig.add_subplot(1, 2, 2, projection="3d")
    ax2d.imshow(image)
    ax2d.set_title("2D projections")
    ax2d.axis("off")
    colors = plt.cm.tab10(np.linspace(0, 1, max(len(results["pose2d_px"]), 1)))

    for p, (pose2d, pose3d) in enumerate(
        zip(results["pose2d_px"], results["pose3d_abs"])
    ):
        c = colors[p % len(colors)]
        for a, b in joint_info.edges:
            ax2d.plot(*zip(pose2d[a], pose2d[b]), color=c, lw=2)
            ax3d.plot(
                [pose3d[a, 0], pose3d[b, 0]],
                [pose3d[a, 2], pose3d[b, 2]],
                [-pose3d[a, 1], -pose3d[b, 1]],
                color=c, lw=2,
            )
        ax2d.scatter(pose2d[:, 0], pose2d[:, 1], s=8, color=c)
    ax3d.set_title("absolute 3D (camera frame, mm)")
    ax3d.set_xlabel("x")
    ax3d.set_ylabel("z (depth)")
    ax3d.set_zlabel("-y (up)")
    try:
        ax3d.set_aspect("equal", adjustable="box")
    except NotImplementedError:
        pass
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    return out_path


def draw_overlay_cv(image, results, joint_info):
    """Fast per-frame 2D overlay (video mode): skeleton edges + joints."""
    import cv2

    img = np.ascontiguousarray(image.copy())
    palette = [(66, 133, 244), (219, 68, 55), (244, 180, 0), (15, 157, 88),
               (171, 71, 188), (0, 172, 193)]
    for p, pose2d in enumerate(results["pose2d_px"]):
        c = palette[p % len(palette)]
        for a, b in joint_info.edges:
            pa, pb = pose2d[a], pose2d[b]
            if np.all(np.isfinite(pa)) and np.all(np.isfinite(pb)):
                cv2.line(img, (int(pa[0]), int(pa[1])), (int(pb[0]), int(pb[1])),
                         c, 2, cv2.LINE_AA)
        for pt in pose2d:
            if np.all(np.isfinite(pt)):
                cv2.circle(img, (int(pt[0]), int(pt[1])), 3, c, -1, cv2.LINE_AA)
    return img


def run_video(est, joint_info, n_frames: int, out_path: str):
    """Synthetic moving-people sequence -> pipelined estimate_stream ->
    overlay video (mp4 via cv2; falls back to an .npz of overlay frames)."""
    import cv2

    from metro_pose3d_tpu.data.synthetic import make_multiperson_sequence

    # two passes over the generator keep memory O(pipeline depth): the
    # estimator consumes one lazily, the overlay loop re-generates frames
    # in lockstep (byte-identical: the generator is deterministic)
    def frames():
        for img, boxes, cam, _ in make_multiperson_sequence(3, n_frames, seed=0):
            yield img, boxes, cam

    writer = None
    fallback = []
    for (img, boxes, cam), out in zip(frames(), est.estimate_stream(frames())):
        overlay = draw_overlay_cv(img, out, joint_info)
        if writer is None and not fallback:
            h, w = overlay.shape[:2]
            writer = cv2.VideoWriter(
                out_path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
            if not writer.isOpened():
                writer = None  # no codec: collect frames for the npz path
        if writer is not None:
            writer.write(cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
        else:
            fallback.append(overlay)
    if writer is None:
        alt = out_path + ".npz"
        np.savez_compressed(alt, frames=np.stack(fallback))
        print(f"VideoWriter unavailable; wrote frames to {alt}")
        return alt
    writer.release()
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", default="", help="input image (default: synthetic)")
    ap.add_argument("--boxes", default="",
                    help='person boxes "x,y,w,h;x,y,w,h"; default: synthetic GT')
    ap.add_argument("--bundle", default="", help="exported model dir")
    ap.add_argument("--logdir", default="", help="training logdir (checkpoint)")
    ap.add_argument("--out", default="/tmp/metro_demo.png")
    ap.add_argument("--video", type=int, default=0, metavar="N",
                    help="render an N-frame synthetic sequence through the "
                         "pipelined estimate_stream into --out (mp4)")
    args = ap.parse_args(argv)

    import jax

    from metro_pose3d_tpu.config import Config
    from metro_pose3d_tpu.geom.joints import H36M_17
    from metro_pose3d_tpu.multiperson import MultiPersonEstimator

    if args.bundle:
        from metro_pose3d_tpu.export import load_exported

        cfg, variables, _ = load_exported(args.bundle)
        joint_info = H36M_17
    else:
        import json
        import os

        from metro_pose3d_tpu.train.checkpoint import Checkpointer
        from metro_pose3d_tpu.train.loop import make_optimizer
        from metro_pose3d_tpu.train.state import create_train_state

        cfg = Config()
        cfg_json = os.path.join(args.logdir, "config.json") if args.logdir else ""
        if cfg_json and os.path.exists(cfg_json):
            # a training logdir stores its full config; rebuild the exact
            # architecture the checkpoint was trained with
            from metro_pose3d_tpu.config import apply_overrides

            stored = json.load(open(cfg_json))
            flat = {
                f"{sec}.{name}": str(val)
                for sec, fields in stored.items()
                for name, val in fields.items()
            }
            cfg = apply_overrides(Config(), flat)
        joint_info = H36M_17
        state = create_train_state(cfg, make_optimizer(cfg))
        if args.logdir:
            state, step = Checkpointer(args.logdir).restore(state)
            print(f"restored step {step} from {args.logdir}")
        else:
            print("warning: random-init model (pass --bundle or --logdir)")
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.video:
        est = MultiPersonEstimator(cfg, variables, joint_info)
        out = args.out if args.out.endswith(".mp4") else args.out + ".mp4"
        path = run_video(est, joint_info, args.video, out)
        print(f"wrote {path} ({args.video} frames)")
        return 0

    if args.image:
        from metro_pose3d_tpu.utils import improc

        image = improc.imread(args.image)
        camera = None
        if not args.boxes:
            sys.exit("--boxes required with --image (x,y,w,h;...)")
        boxes = np.array(
            [[float(v) for v in b.split(",")] for b in args.boxes.split(";")]
        )
    else:
        from metro_pose3d_tpu.data.synthetic import make_multiperson_frame

        image, boxes, camera, _ = make_multiperson_frame(3, seed=0)

    est = MultiPersonEstimator(cfg, variables, joint_info)
    results = est.estimate_frame(image, boxes, camera)
    path = draw_demo(image, results, joint_info, args.out)
    print(f"wrote {path} ({len(boxes)} people)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
