"""On-chip training-convergence smoke with the two-pass augment kernels.

The two-pass sampler changes training augmentation sub-pixel-wise vs the
packed path; this runs REAL fused train steps (augment+fwd+bwd+Adam) on a
bank of host-prepared synthetic batches and tracks loss + val MPJPE, for
either sampler, to evidence healthy training numerics on the chip.

Device-bound by design: batches are prepared once on the host (the real
pipeline's prepare_example) and cycled; the 1-CPU container cannot feed
fresh batches at chip rate (BASELINE.md host-feed ceiling).

Run: timeout 580 python scripts/exp_train_smoke_chip.py [sampler] [steps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sampler = sys.argv[1] if len(sys.argv) > 1 else "twopass"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    if len(sys.argv) > 3:  # optional pool-backward impl A/B (round 3):
        # "ad" = train-route shift-max autodiff (production default);
        # "masks"/"maxtree" = force the custom_vjp route with that backward.
        from metro_pose3d_tpu.ops import pool_pallas

        if sys.argv[3] == "ad":
            pool_pallas.POOL_TRAIN_IMPL = "ad"
        else:
            pool_pallas.POOL_TRAIN_IMPL = "custom"
            pool_pallas.POOL_BWD_IMPL = sys.argv[3]
        print(f"pool backward: {sys.argv[3]}")
    bs, n_batches = 64, 16

    from metro_pose3d_tpu.config import Config, apply_overrides
    from metro_pose3d_tpu.data.synthetic import SyntheticDataset
    from metro_pose3d_tpu.evaluation.predict import (
        make_dataset_predict_fn, predict_dataset,
    )
    from metro_pose3d_tpu.models.metro import MetroModel
    from metro_pose3d_tpu.pipeline.loader import batch_iterator
    from metro_pose3d_tpu.pipeline.occluders import make_procedural_occluders
    from metro_pose3d_tpu.train.loop import make_optimizer, make_train_step
    from metro_pose3d_tpu.train.state import TrainState

    cfg = apply_overrides(Config(), {
        "model.backbone": "resnet18", "model.proc_side": "128",
        "data.source_side": "256", "train.batch_size": str(bs),
        "train.base_lr": "2e-4", "eval.batch_size": "64",
        "eval.flip_tta": "false",
    })
    cfg = dataclasses.replace(cfg, aug=dataclasses.replace(cfg.aug, warp_sampler=sampler))

    ds = SyntheticDataset(n_train=bs * n_batches, n_test=128, imshape=(256, 256))
    occ_bank = jnp.asarray(make_procedural_occluders(48, 96))

    t0 = time.time()
    batches = []
    it = batch_iterator(
        ds.train_example, ds.n_train, ds.joint_info, bs,
        cfg.model.proc_side, cfg.data.source_side, aug_cfg=cfg.aug,
        seed=0, n_workers=3, n_occluders=occ_bank.shape[0])
    for b in it:
        batches.append(jax.device_put(b))
        if len(batches) >= n_batches:
            break
    print(f"prepared {n_batches} x bs{bs} batches in {time.time()-t0:.0f}s")

    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3)), train=True)
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step_fn = make_train_step(cfg, tx, 0, occluder_bank=occ_bank)

    root = ds.joint_info.names.index("pelv")
    val_fn = make_dataset_predict_fn(cfg, ds)  # jit once, reuse every val

    def val_mpjpe(state):
        res = predict_dataset(
            cfg, {"params": state.params, "batch_stats": state.batch_stats},
            ds, n_examples=128, predict_fn=val_fn)
        gt_rel = res["gt3d_abs"] - res["gt3d_abs"][:, root : root + 1]
        return float(np.linalg.norm(
            res["pose3d_rootrel"] - gt_rel, axis=-1).mean())

    print(f"[{sampler}] step 0: val MPJPE {val_mpjpe(state):.1f} mm")
    t0 = time.time()
    losses = []
    for i in range(n_steps):
        state, m = step_fn(state, batches[i % n_batches])
        if (i + 1) % 50 == 0:
            losses.append(float(m["loss"]))
        if (i + 1) % 300 == 0:
            dt = time.time() - t0
            print(f"[{sampler}] step {i+1}: loss {losses[-1]:.4f} "
                  f"val MPJPE {val_mpjpe(state):.1f} mm "
                  f"({(i+1)*bs/dt:.0f} crops/s incl. val)")
    finite = all(np.isfinite(x) for x in losses)
    print(f"[{sampler}] done: losses finite={finite} "
          f"first {losses[0]:.4f} last {losses[-1]:.4f}")


if __name__ == "__main__":
    main()
