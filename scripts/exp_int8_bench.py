"""Quantized (int8) flagship inference benchmark on the real chip.

Stage "calib" calibrates on random crops (mechanism benchmark — real
deployments calibrate on dataset crops) and saves the per-conv scales to
/tmp/int8_quant.npz; stages "notta"/"tta" load them and time the fused
predict graph. Split because each full-R50 compile costs minutes under the
600 s command cap. Run: python scripts/exp_int8_bench.py calib|notta|tta [stages]
(`stages`: "all" or csv like "5" / "4,5" -> model.quantize_stages)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "notta"
    stages = sys.argv[2] if len(sys.argv) > 2 else "all"
    from metro_pose3d_tpu.config import Config
    from metro_pose3d_tpu.evaluation.engine import make_predict_fn
    from metro_pose3d_tpu.geom.joints import H36M_17
    from metro_pose3d_tpu.models.metro import MetroModel
    from metro_pose3d_tpu.models.quantize import calibrate
    from metro_pose3d_tpu.ops.color import normalize
    import pickle

    bs = 512
    rng = np.random.RandomState(0)
    cfg0 = Config()
    base = MetroModel(cfg0.model)
    variables = base.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False)

    qpath = f"/tmp/int8_quant_{stages.replace(',', '_')}.pkl"
    if which == "calib":
        cfg_cal = dataclasses.replace(
            cfg0, model=dataclasses.replace(
                cfg0.model, quantize="calib", quantize_stages=stages))
        calib_model = MetroModel(cfg_cal.model)
        crops_u8 = rng.randint(0, 256, (2, 64, 256, 256, 3))
        cal_batches = [
            normalize(jnp.asarray(c, jnp.uint8).astype(jnp.float32) / 255.0)
            for c in crops_u8
        ]
        t0 = time.time()
        calibrated = calibrate(calib_model, dict(variables), cal_batches)
        quant_host = jax.tree_util.tree_map(np.asarray, calibrated["quant"])
        with open(qpath, "wb") as f:
            pickle.dump(quant_host, f)
        print(f"calibration: {time.time()-t0:.0f}s "
              f"({len(jax.tree_util.tree_leaves(quant_host))} conv scales) -> {qpath}")
        return

    with open(qpath, "rb") as f:
        quant_host = pickle.load(f)
    calibrated = dict(variables)
    calibrated["quant"] = jax.tree_util.tree_map(jnp.asarray, quant_host)

    cfg_q = dataclasses.replace(
        cfg0, model=dataclasses.replace(
            cfg0.model, quantize="int8", quantize_stages=stages))
    crops = jnp.asarray(rng.randint(0, 256, (bs, 256, 256, 3)), jnp.uint8)
    intr = jnp.tile(jnp.asarray(
        [[1200.0, 0, 127.5], [0, 1200.0, 127.5], [0, 0, 1.0]], jnp.float32)[None],
        (bs, 1, 1))
    for tta in ([False] if which == "notta" else [True]):
        fn = make_predict_fn(cfg_q, H36M_17.mirror_mapping, 0, flip_tta=tta,
                             reconstruct=True)
        out = fn(calibrated, crops, intr)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(calibrated, crops, intr)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"int8[{stages}] predict bs{bs} tta={tta}: {dt*1e3:7.2f} ms  {bs/dt:8.0f} crops/s")
        assert np.isfinite(np.asarray(out["pose3d_rootrel"])).all()


if __name__ == "__main__":
    main()
