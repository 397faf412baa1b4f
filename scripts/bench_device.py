"""Device-side pipeline benchmarks (VERDICT r1 next-round item 1 evidence).

Measures, on the real chip, with both warp samplers:
  1. tile->skeleton: uint8 512^2 source tiles -> warp -> model -> decode ->
     reconstruction (the from_tiles predict graph), bs256
  2. full fused train step: augment (bg-free) + fwd + bwd + Adam, R50@256

Run: timeout 580 python scripts/bench_device.py [tile|train] [sampler]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def make_batch(bs, tile, side, j, rng, spec_keys):
    from metro_pose3d_tpu.pipeline.device import example_spec

    spec = example_spec(j, tile, side)
    batch = {}
    for name, (shape, dtype) in spec.items():
        if name == "source":
            batch[name] = jnp.asarray(rng.randint(0, 256, (bs,) + shape), dtype)
        elif name == "warp_h":
            hs = []
            for _ in range(bs):
                ang = rng.uniform(-0.4, 0.4)
                sc = rng.uniform(0.8, 1.6)
                c, s = np.cos(ang), np.sin(ang)
                a = np.array([[sc * c, -sc * s], [sc * s, sc * c]])
                t = np.array([tile / 2, tile / 2]) - a @ np.array([side / 2, side / 2])
                hm = np.eye(3)
                hm[:2, :2] = a
                hm[:2, 2] = t
                hs.append(hm)
            batch[name] = jnp.asarray(np.stack(hs), jnp.float32)
        elif name == "warp_k":
            batch[name] = jnp.tile(
                jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)[None], (bs, 1))
        elif name == "intrinsics":
            batch[name] = jnp.tile(jnp.asarray(
                [[1200.0, 0, side / 2], [0, 1200.0, side / 2], [0, 0, 1]],
                jnp.float32)[None], (bs, 1, 1))
        elif name == "coords3d_true":
            batch[name] = jnp.asarray(rng.uniform(-500, 500, (bs,) + shape), dtype)
        elif name == "coords2d_true":
            batch[name] = jnp.asarray(rng.uniform(0, side, (bs,) + shape), dtype)
        elif name in ("joint_validity", "joint_validity_2d", "is_3d"):
            batch[name] = jnp.ones((bs,) + shape, dtype)
        elif name == "occ_affine":
            batch[name] = jnp.tile(
                jnp.asarray([[0.3, 0, 20.0], [0, 0.3, 20.0]], jnp.float32)[None],
                (bs, 1, 1))
        else:
            batch[name] = jnp.zeros((bs,) + shape, dtype)
    return batch


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    samplers = [sys.argv[2]] if len(sys.argv) > 2 else ["twopass", "packed"]
    from metro_pose3d_tpu.config import Config
    from metro_pose3d_tpu.evaluation.engine import make_predict_fn
    from metro_pose3d_tpu.geom.joints import H36M_17
    from metro_pose3d_tpu.models.metro import MetroModel

    rng = np.random.RandomState(0)

    for sampler in samplers:
        cfg = Config()
        cfg = dataclasses.replace(cfg, aug=dataclasses.replace(cfg.aug, warp_sampler=sampler))
        j = cfg.model.num_joints
        tile, side = cfg.data.source_side, cfg.model.proc_side

        if what in ("all", "tile"):
            bss = (tuple(int(x) for x in sys.argv[3].split(","))
                   if len(sys.argv) > 3 else (256,))
            model = MetroModel(cfg.model)
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, side, side, 3)), train=False)
            fn = make_predict_fn(cfg, H36M_17.mirror_mapping, 0, flip_tta=False,
                                 reconstruct=True, from_tiles=True)
            for bs in bss:
                batch = make_batch(bs, tile, side, j, rng, None)
                dt = timeit(fn, variables, batch)
                print(f"[{sampler}] tile->skeleton bs{bs}: {dt*1e3:7.1f} ms  "
                      f"{bs/dt:7.0f} crops/s", flush=True)

        if what in ("all", "train"):
            from metro_pose3d_tpu.train.loop import make_optimizer, make_train_step
            from metro_pose3d_tpu.train.state import TrainState

            bss = (tuple(int(x) for x in sys.argv[3].split(","))
                   if len(sys.argv) > 3 else (64, 128, 256))
            for bs in bss:
                model = MetroModel(cfg.model)
                variables = model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, side, side, 3)), train=True)
                tx = make_optimizer(cfg)
                state = TrainState(
                    step=jnp.zeros((), jnp.int32), params=variables["params"],
                    batch_stats=variables["batch_stats"],
                    opt_state=tx.init(variables["params"]))
                occ = jnp.asarray(rng.uniform(0, 1, (64, 128, 128, 4)), jnp.float32)
                step_fn = make_train_step(cfg, tx, 0, occluder_bank=occ)
                batch = make_batch(bs, tile, side, j, rng, None)
                state, m = step_fn(state, batch)
                jax.block_until_ready(m)
                # re-init state each iter is wrong; time steady-state by
                # reusing state (donated) via a loop of the jitted fn
                times = []
                for _ in range(8):
                    t0 = time.perf_counter()
                    state, m = step_fn(state, batch)
                    jax.block_until_ready(m)
                    times.append(time.perf_counter() - t0)
                dt = float(np.median(times))
                print(f"[{sampler}] train step bs{bs}: {dt*1e3:7.1f} ms  {bs/dt:7.0f} crops/s/chip")


if __name__ == "__main__":
    main()
