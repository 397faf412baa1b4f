"""Serving latency curve: crop->skeleton per-call latency vs batch size.

BASELINE.json's tracked metric set includes p50 crop latency; bench.py
reports it at the throughput-optimal bs512 only. Serving cares about the
small-batch end: this measures the fused predict program (normalize ->
R50@256 -> decode -> absolute reconstruction; TTA off and on) at
bs 1/8/32/128/512 with device-resident inputs and sum-reduced outputs
(np.asarray sync), i.e. chip-side latency excluding the dev tunnel's
per-RPC transfer costs, which real deployments don't pay.

Run: timeout 1500 python scripts/exp_latency_curve.py [--int8]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    int8 = "--int8" in sys.argv
    from metro_pose3d_tpu.config import Config, apply_overrides
    from metro_pose3d_tpu.evaluation.engine import make_predict_fn
    from metro_pose3d_tpu.geom.joints import H36M_17
    from metro_pose3d_tpu.models.metro import MetroModel

    overrides = {"model.quantize": "int8"} if int8 else {}
    cfg = apply_overrides(Config(), overrides)
    rng = np.random.RandomState(0)

    if int8:
        import dataclasses

        from metro_pose3d_tpu.models.quantize import calibrate

        base = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quantize="none"))
        model_f = MetroModel(base.model)
        variables = model_f.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3)),
            train=False)
        calib_model = MetroModel(
            dataclasses.replace(cfg.model, quantize="calib"))
        crops = jnp.asarray(
            rng.uniform(-1, 1, (32, cfg.model.proc_side, cfg.model.proc_side, 3)),
            jnp.float32)
        variables = calibrate(calib_model, dict(variables), [crops])
    else:
        model = MetroModel(cfg.model)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3)),
            train=False)

    for tta in (False, True):
        fn = make_predict_fn(cfg, H36M_17.mirror_mapping, root_index=0,
                             flip_tta=tta, reconstruct=True, from_tiles=False)
        fsum = jax.jit(lambda v, c, k: jax.tree.map(jnp.sum, fn(v, c, k)))
        for bs in (1, 8, 32, 128, 512):
            crops = jnp.asarray(
                rng.randint(0, 256, (bs, cfg.model.proc_side,
                                     cfg.model.proc_side, 3)), jnp.uint8)
            intr = jnp.tile(jnp.asarray(
                [[1200.0, 0, 128], [0, 1200.0, 128], [0, 0, 1]],
                jnp.float32)[None], (bs, 1, 1))
            out = fsum(variables, crops, intr)
            np.asarray(out["pose3d_rootrel"])
            iters = 30 if bs <= 128 else 15
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fsum(variables, crops, intr)
            np.asarray(out["pose3d_rootrel"])
            dt = (time.perf_counter() - t0) / iters
            mode = ("int8" if int8 else "bf16") + ("+tta" if tta else "")
            print(f"[{mode:9s}] bs{bs:4d}: {dt*1e3:8.2f} ms/call  "
                  f"{bs/dt:9.0f} crops/s", flush=True)


if __name__ == "__main__":
    main()
