"""Multi-person frame-mode throughput with the two-pass kernel (real chip).

720p frame, 16 people, flagship model — round-1 measured 143 ms/frame
(packed sampler). Run: timeout 580 python scripts/exp_multiperson_chip.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from metro_pose3d_tpu.config import Config
    from metro_pose3d_tpu.geom.joints import H36M_17
    from metro_pose3d_tpu.models.metro import MetroModel
    from metro_pose3d_tpu.multiperson import make_multiperson_predict_fn

    rng = np.random.RandomState(0)
    n_people = 16
    frame = jnp.asarray(rng.randint(0, 256, (720, 1280, 3)), jnp.uint8)
    hs, ks, ds = [], [], []
    for i in range(n_people):
        sc = rng.uniform(0.8, 2.0)
        cx, cy = rng.uniform(200, 1080), rng.uniform(150, 570)
        hm = np.eye(3)
        hm[0, 0] = hm[1, 1] = sc
        hm[:2, 2] = [cx - sc * 128, cy - sc * 128]
        hs.append(hm)
        ks.append([1.0, 1.0, 0.0, 0.0])
        ds.append([0.0] * 5)
    batch = {
        "frame": frame,
        "warp_h": jnp.asarray(np.stack(hs), jnp.float32),
        "warp_k": jnp.asarray(ks, jnp.float32),
        "warp_dist": jnp.asarray(ds, jnp.float32),
        "intrinsics": jnp.tile(jnp.asarray(
            [[1100.0, 0, 640.0], [0, 1100.0, 360.0], [0, 0, 1]], jnp.float32)[None],
            (n_people, 1, 1)),
        "rot_to_orig": jnp.tile(jnp.eye(3, dtype=jnp.float32)[None],
                                (n_people, 1, 1)),
    }
    for sampler in (sys.argv[1:] or ["twopass", "packed"]):
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, aug=dataclasses.replace(cfg.aug, warp_sampler=sampler))
        model = MetroModel(cfg.model)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3)), train=False)
        fn = make_multiperson_predict_fn(
            cfg, H36M_17.mirror_mapping, root_index=0, frame_mode=True)
        out = fn(variables, batch)
        jax.block_until_ready(out)
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            out = fn(variables, batch)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(f"[{sampler}] frame mode 720p x{n_people}: {dt*1e3:7.1f} ms/frame "
              f"({n_people/dt:6.0f} people/s, {1/dt:5.1f} fps)")


if __name__ == "__main__":
    main()
