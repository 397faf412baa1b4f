#!/usr/bin/env python
"""Sustained loader -> put_batch -> predict pipeline benchmark (one box).

VERDICT r3 weak #6: the 5k host-feed story was a per-core MODEL (native
engine ex/s/core x cores, process-pool linearity extrapolated); nothing ran
the ASSEMBLED pipeline — loader prep, host->device transfer, fused predict —
concurrently at a sustained rate. This script turns the model into a
measurement on whatever hardware it runs on:

  phase A  host-only:    drain the real `batch_iterator` (no device work)
  phase B  device-only:  one resident batch through the fused predict fn
  phase C  assembled:    the predict_dataset feed loop (loader + shard_batch
                         + dispatch-ahead predict) for --duration seconds

and reports sustained crops/s plus overlap efficiency
  eff = sustained / min(host_rate, device_rate)
(1.0 = the pipeline fully hides the slower side behind the faster one) and
the fraction of wall time the feed loop spent blocked on the loader.

Synthetic frames are pre-rendered into memory (the production analog is the
decoded-frame LRU cache): the pipeline cost measured is crop preparation +
stacking + transfer + compute, not the synthetic renderer.

    python scripts/exp_sustained_feed.py [--duration 45] [--batch-size 128]
        [--pool thread|process] [--engine auto|python|native] [--workers N]

Prints one JSON line per phase plus a summary line.
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


class _CachedSynthetic:
    """Pre-rendered synthetic examples served from memory, cycled so a
    timed run never exhausts the split (row identity doesn't matter here)."""

    def __init__(self, n_cache: int, n_test: int, imshape):
        from metro_pose3d_tpu.data.synthetic import SyntheticDataset

        base = SyntheticDataset(n_train=1, n_test=n_cache, imshape=imshape)
        self._cache = [base.test_example(i) for i in range(n_cache)]
        self.joint_info = base.joint_info
        self.root_joint = base.root_joint
        self.n_test = n_test

    def test_example(self, i: int):
        return self._cache[i % len(self._cache)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=45.0)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--pool", default="thread")
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 4)
    ap.add_argument("--n-cache", type=int, default=192)
    ap.add_argument("--imside", type=int, default=512)
    ap.add_argument("--set", action="append", default=[],
                    help="extra dotted config overrides, e.g. "
                         "--set model.backbone=tiny (CPU smoke)")
    args = ap.parse_args()

    import jax

    from metro_pose3d_tpu.config import Config, apply_overrides
    from metro_pose3d_tpu.evaluation.predict import make_dataset_predict_fn
    from metro_pose3d_tpu.pipeline.loader import batch_iterator

    overrides = {
        "eval.batch_size": str(args.batch_size),
        "data.pool_type": args.pool,
        "data.host_prep": args.engine,
        "data.workers": str(args.workers),
    }
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = v
    cfg = apply_overrides(Config(), overrides)
    ds = _CachedSynthetic(args.n_cache, n_test=1_000_000,
                          imshape=(args.imside, args.imside))
    print(json.dumps({"stage": "setup", "device": str(jax.devices()[0]),
                      "pool": args.pool, "engine": args.engine,
                      "workers": args.workers,
                      "batch_size": args.batch_size}), flush=True)

    def make_it():
        return batch_iterator(
            ds.test_example, ds.n_test, ds.joint_info, cfg.eval.batch_size,
            cfg.model.proc_side, cfg.data.source_side, aug_cfg=None,
            shuffle=False, max_epochs=1, drop_remainder=True,
            n_workers=cfg.data.workers,
            box_expansion=cfg.data.test_box_expansion,
            pool_type=cfg.data.pool_type, host_prep=cfg.data.host_prep,
        )

    # ---- phase A: host-only loader rate --------------------------------
    it = make_it()
    first = next(it)  # warm pools / build the native extension
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < args.duration / 3:
        next(it)
        n += cfg.eval.batch_size
    host_rate = n / (time.perf_counter() - t0)
    print(json.dumps({"stage": "host_only",
                      "examples_per_sec": round(host_rate, 1)}), flush=True)

    # ---- phase B: device-only rate on one resident batch ---------------
    from metro_pose3d_tpu.models.metro import MetroModel

    model = MetroModel(dataclasses.replace(
        cfg.model.at_phase(train=False), quantize="none"))
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3), np.float32),
        train=False)
    fn = make_dataset_predict_fn(cfg, ds)
    first.pop("_pad", None)
    resident = jax.device_put({k: v for k, v in first.items()})
    out = fn(variables, resident)
    np.asarray(out["pose3d_rootrel"])  # compile + sync
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < args.duration / 3:
        out = fn(variables, resident)
        np.asarray(out["pose3d_rootrel"])
        n += cfg.eval.batch_size
    device_rate = n / (time.perf_counter() - t0)
    print(json.dumps({"stage": "device_only",
                      "crops_per_sec": round(device_rate, 1)}), flush=True)

    # ---- phase C: assembled pipeline (dispatch-ahead, depth 1) ---------
    it = make_it()
    t0 = time.perf_counter()
    n = 0
    wait_s = 0.0
    pending = None
    while time.perf_counter() - t0 < args.duration:
        tw = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            break
        wait_s += time.perf_counter() - tw
        batch.pop("_pad", None)
        dispatched = fn(variables, {k: v for k, v in batch.items()})
        if pending is not None:
            np.asarray(pending["pose3d_rootrel"])  # sync batch i-1 while i runs
            n += cfg.eval.batch_size
        pending = dispatched
    if pending is not None:
        np.asarray(pending["pose3d_rootrel"])
        n += cfg.eval.batch_size
    wall = time.perf_counter() - t0
    sustained = n / wall
    ceiling = min(host_rate, device_rate)
    print(json.dumps({"stage": "assembled",
                      "sustained_crops_per_sec": round(sustained, 1),
                      "wall_s": round(wall, 1),
                      "loader_wait_frac": round(wait_s / wall, 3)}), flush=True)
    print(json.dumps({
        "stage": "summary",
        "host_only": round(host_rate, 1),
        "device_only": round(device_rate, 1),
        "sustained": round(sustained, 1),
        "overlap_efficiency": round(sustained / ceiling, 3),
        "bound_by": "host" if host_rate < device_rate else "device",
    }), flush=True)


if __name__ == "__main__":
    main()
