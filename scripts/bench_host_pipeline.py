#!/usr/bin/env python
"""Host-side input-pipeline throughput benchmark.

The device benchmark (bench.py) isolates TPU throughput; this tool measures
whether the HOST can feed it (SURVEY.md §8 hard part 3): threaded JPEG
decode rate (native libjpeg extension) and per-example crop preparation
(`pipeline.crops.prepare_example`: virtual-camera algebra + source-tile
slice + GT bookkeeping).

    python scripts/bench_host_pipeline.py [--threads N]

Prints one JSON line per stage. Rule of thumb: crops/sec/chip from bench.py
must be <= decode_per_sec and prep_per_sec times the host count (or the
frame cache must absorb the difference).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 4)
    ap.add_argument("--n", type=int, default=64)
    args = ap.parse_args()

    import cv2

    from metro_pose3d_tpu.data.synthetic import make_example
    from metro_pose3d_tpu.geom.joints import H36M_17
    from metro_pose3d_tpu.pipeline.crops import prepare_example
    from metro_pose3d_tpu.utils import improc

    # --- JPEG decode throughput (1000x1000 synthetic frame) ---------------
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (1000, 1000, 3)).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, 90])
    data = [enc.tobytes()] * args.n
    improc.decode_jpeg_batch(data[:2], threads=2)  # warm the extension
    t0 = time.perf_counter()
    improc.decode_jpeg_batch(data, threads=args.threads)
    dt = time.perf_counter() - t0
    mb = len(data[0]) * args.n / 1e6
    print(json.dumps({
        "stage": "jpeg_decode", "native": improc.have_native(),
        "threads": args.threads, "images_per_sec": round(args.n / dt, 1),
        "compressed_mb_per_sec": round(mb / dt, 1),
    }))

    # --- crop preparation (image already decoded, as in a frame cache) ----
    ex = make_example(0, imshape=(1000, 1000))
    from metro_pose3d_tpu.pipeline.crops import _native_engine, sample_aug_params
    from metro_pose3d_tpu.config import Config

    engines = ["python"] + (["native"] if _native_engine() else [])
    aug_cfg = Config().aug
    for engine in engines:
        prepare_example(ex, H36M_17, 256, 512, engine=engine)  # warm
        t0 = time.perf_counter()
        for i in range(args.n):
            prepare_example(ex, H36M_17, 256, 512, engine=engine)
        dt = time.perf_counter() - t0
        rng = np.random.default_rng(0)
        t1 = time.perf_counter()
        for i in range(args.n):
            aug, occ = sample_aug_params(rng, aug_cfg, 100, 10)
            prepare_example(ex, H36M_17, 256, 512, aug=aug, occ_center=occ,
                            engine=engine)
        dt_aug = time.perf_counter() - t1
        print(json.dumps({
            "stage": "prepare_example", "engine": engine,
            "per_sec": round(args.n / dt, 1),
            "ms_each": round(dt / args.n * 1000, 2),
            "aug_per_sec": round(args.n / dt_aug, 1),
            "aug_ms_each": round(dt_aug / args.n * 1000, 2),
        }))


if __name__ == "__main__":
    main()
