"""Truncation-robustness A/B: trained metro vs trained 2.5D baseline.

The MeTRo paper's headline experiment (SURVEY.md §7 "Truncation robustness"
row; VERDICT r4 missing #2): train BOTH model classes on the same synthetic
data, then progressively cut the person box from the bottom and measure
full-skeleton root-relative MPJPE, split into visible (in-crop) and hidden
(out-of-crop) joints. The metric volumetric head (`metro`) keeps decoding
out-of-frame joints at metric positions; the image-aligned 2.5D baseline
(`twofive`) cannot — its x/y soft-argmax is bounded to the crop, so hidden
joints clamp to the crop border and the error grows with truncation.

Usage:
  chip receipt:  python scripts/exp_truncation_ab.py --backbone resnet18 \
                     --proc-side 128 --steps 3000 --batch-size 64
  CPU probe:     python scripts/exp_truncation_ab.py --cpu --backbone tiny \
                     --proc-side 64 --steps 400 --batch-size 16
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="run on the 8-virtual-device CPU mesh")
    p.add_argument("--backbone", default="resnet18")
    p.add_argument("--proc-side", type=int, default=128)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--cycle-batches", type=int, default=16,
                   help="pre-prepared device-resident batches (0 = live prep)")
    p.add_argument("--n-train", type=int, default=1024)
    p.add_argument("--n-eval", type=int, default=64)
    p.add_argument("--out", default="/tmp/truncation_ab.json")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        # platform decision BEFORE any device query (sitecustomize forces
        # the axon TPU and overrides JAX_PLATFORMS at interpreter start)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8")
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from metro_pose3d_tpu.config import Config, apply_overrides
    from metro_pose3d_tpu.data.synthetic import SyntheticDataset
    from metro_pose3d_tpu.evaluation.truncation import evaluate_truncation
    from metro_pose3d_tpu.train.trainer import train

    fractions = (0.0, 0.1, 0.2, 0.3, 0.4, 0.5)
    ds = SyntheticDataset(n_train=args.n_train, n_test=max(args.n_eval, 64),
                          imshape=(256, 256))
    report = {"config": vars(args), "models": {}}
    for model_class in ("metro", "twofive"):
        logdir = f"/tmp/trunc_ab_{model_class}"
        shutil.rmtree(logdir, ignore_errors=True)
        cfg = apply_overrides(Config(), {
            "model.model_class": model_class,
            "model.backbone": args.backbone,
            "model.proc_side": str(args.proc_side),
            "data.source_side": "256",
            "data.workers": "2",
            "data.cycle_batches": str(args.cycle_batches),
            "train.batch_size": str(args.batch_size),
            "train.num_steps": str(args.steps),
            "train.warmup_steps": str(min(100, args.steps // 10)),
            "train.log_every": "100",
            "train.checkpoint_every": str(args.steps),
            "train.validate_every": "0",
        })
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, logdir=logdir))
        t0 = time.perf_counter()
        state = train(cfg, ds)
        train_s = time.perf_counter() - t0
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        t0 = time.perf_counter()
        table = evaluate_truncation(
            cfg, variables, ds, fractions=fractions, n_examples=args.n_eval)
        eval_s = time.perf_counter() - t0
        report["models"][model_class] = {
            "train_s": round(train_s, 1),
            "eval_s": round(eval_s, 1),
            "truncation": {str(k): {m: round(float(v), 2)
                                    for m, v in row.items()}
                           for k, row in table.items()},
        }
        print(f"[{model_class}] trained {args.steps} steps in {train_s:.0f}s; "
              f"truncation table:", flush=True)
        for frac, row in table.items():
            print(f"  frac={frac:.1f}  " + "  ".join(
                f"{m}={v:.1f}" for m, v in row.items()), flush=True)

    # the headline relation: metro's hidden-joint error vs the baseline's
    rel = {}
    for frac in fractions:
        m = report["models"]["metro"]["truncation"][str(frac)]
        t = report["models"]["twofive"]["truncation"][str(frac)]
        if "mpjpe_hidden" in m and "mpjpe_hidden" in t:
            rel[frac] = {"metro_hidden": m["mpjpe_hidden"],
                         "twofive_hidden": t["mpjpe_hidden"],
                         "ratio": round(t["mpjpe_hidden"]
                                        / max(m["mpjpe_hidden"], 1e-9), 2)}
    report["hidden_joint_relation"] = rel
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(rel, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
