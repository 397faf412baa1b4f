#!/usr/bin/env python
"""Protocol parity ON CHIP: run the frozen-H36M-shard predict path (tiny
model, flip-TTA + bone rescale + absolute reconstruction) on the real TPU
and compare against the golden pinned by the CPU test suite
(tests/golden/h36m_shard_golden.json).

This is the strongest single-chip parity statement available without
licensed data: the SAME disk shard, SAME weights (PRNGKey(42) init), SAME
predict graph — the CPU 8-virtual-device mesh and the axon chip must agree
on the protocol MPJPE to float tolerance (everything numerics-relevant is
pinned: precision=HIGHEST einsums, f32 compute dtype in the rehearsal
config, deterministic crops).

Expects the shard at /tmp/h36m_shard (written CPU-side by
data/synth_shard.write_synthetic_h36m_shard — byte-stable).

Run: timeout 1500 python scripts/exp_shard_parity_chip.py
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = "/root/repo/tests/golden/h36m_shard_golden.json"

OVERRIDES = {
    # mirror tests/test_h36m_shard.py OVERRIDES exactly
    "model.backbone": "tiny",
    "model.proc_side": "64",
    "model.depth": "4",
    "model.compute_dtype": "float32",
    "data.source_side": "128",
    "data.workers": "2",
    "eval.batch_size": "8",
    "eval.flip_tta": "true",
    "eval.reconstruct_absolute": "true",
    "eval.scale_recovery": "bone_lengths",
}


def run_once(tag: str) -> dict:
    from metro_pose3d_tpu.config import Config, apply_overrides
    from metro_pose3d_tpu.data.h36m import H36MDataset
    from metro_pose3d_tpu.evaluation.eval_h36m import evaluate
    from metro_pose3d_tpu.evaluation.predict import predict_dataset, save_predictions
    from metro_pose3d_tpu.models.metro import MetroModel

    cfg = apply_overrides(Config(), OVERRIDES)
    ds = H36MDataset("/tmp/h36m_shard")
    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(42), jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False,
    )
    result = predict_dataset(cfg, variables, ds)
    path = f"/tmp/h36m_shard/predictions_chip_{tag}.npz"
    save_predictions(result, path)
    return evaluate(path)


def main():
    print("device:", jax.devices()[0].platform, flush=True)
    with open(GOLDEN) as f:
        golden = json.load(f)
    print(f"gold     mpjpe {golden['mpjpe']:.6f}  pa {golden['pa_mpjpe']:.6f}  "
          f"abs {golden['abs_mpjpe']:.6f}")

    # 1) platform default: TPU feeds bf16-mantissa inputs to f32 convs, so a
    # sub-0.1% protocol drift vs the CPU golden is EXPECTED and bounded here
    scores = run_once("default")
    drift = abs(scores["mpjpe"] - golden["mpjpe"]) / golden["mpjpe"]
    print(f"default  mpjpe {scores['mpjpe']:.6f}  pa {scores['pa_mpjpe']:.6f}  "
          f"abs {scores['abs_mpjpe']:.6f}   rel drift {drift:.2e}", flush=True)
    assert drift < 2e-3, f"default-precision drift too large: {drift}"

    # 2) model.matmul_precision=highest: exact CPU<->TPU protocol parity
    jax.config.update("jax_default_matmul_precision", "highest")
    scores = run_once("highest")
    print(f"highest  mpjpe {scores['mpjpe']:.6f}  pa {scores['pa_mpjpe']:.6f}  "
          f"abs {scores['abs_mpjpe']:.6f}", flush=True)
    for key in ("mpjpe", "pa_mpjpe", "abs_mpjpe"):
        np.testing.assert_allclose(scores[key], golden[key], rtol=1e-4,
                                   err_msg=f"chip-vs-golden drift: {key}")
    for action, val in golden["per_action_mpjpe"].items():
        np.testing.assert_allclose(
            scores["per_action_mpjpe"][action], val, rtol=1e-4,
            err_msg=f"per-action drift: {action}")
    print("CHIP (matmul_precision=highest) MATCHES CPU-PINNED PROTOCOL "
          "GOLDEN (rtol 1e-4)")


if __name__ == "__main__":
    main()
