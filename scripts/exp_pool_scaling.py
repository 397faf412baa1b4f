#!/usr/bin/env python
"""Host-loader pool scaling probe (VERDICT r2 missing #4 'Done' criterion).

Measures batch_iterator throughput (examples/s) for thread vs process pools
at 1..N workers on the synthetic dataset (decode-free: the synthetic
examples render with cv2, which is itself the host cost here — comparable
to prepare_example+render). Run on CPU:

    JAX_PLATFORMS=cpu python scripts/exp_pool_scaling.py
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

# sitecustomize force-imports jax on the axon TPU platform at interpreter
# start; pin the config to CPU BEFORE any package import creates device
# arrays (host-side probe must not touch the tunnel)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    from metro_pose3d_tpu.config import AugConfig
    from metro_pose3d_tpu.data.synthetic import SyntheticDataset
    from metro_pose3d_tpu.pipeline.loader import batch_iterator

    ds = SyntheticDataset(n_train=256, imshape=(512, 512))
    ncpu = os.cpu_count()
    print(f"host cpus: {ncpu}")
    for pool_type in ("thread", "process"):
        for workers in (1, 2, 4):
            it = batch_iterator(
                ds.train_example, 256, ds.joint_info, batch_size=32,
                proc_side=256, tile_side=512, aug_cfg=AugConfig(), seed=0,
                max_epochs=1, n_workers=workers, n_occluders=8,
                pool_type=pool_type,
            )
            b0 = next(it)  # warm up pool + imports
            t0 = time.perf_counter()
            n = len(b0["is_3d"])
            for b in it:
                n += len(b["is_3d"])
            dt = time.perf_counter() - t0
            print(f"{pool_type:8s} workers={workers}: "
                  f"{(n - 32) / dt:8.1f} examples/s ({n - 32} in {dt:.2f}s)")


if __name__ == "__main__":
    main()
