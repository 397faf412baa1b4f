"""Real-chip CLI rehearsals of BASELINE configs 2 and 5 (the two not yet
driven through the actual entry point on hardware; configs 3/4 were
rehearsed earlier in round 3).

  config 2: full H36M eval protocol — synthetic disk shard -> --test
            (flagship R50@256, flip-TTA + bone rescale + absolute
            reconstruction, sharded predict) -> --eval-h36m
  config 5: multi-person end-to-end — synthetic 3DPW release ->
            --test-multiperson (detector boxes -> bucketed crops ->
            absolute back-projection) -> --eval-3dpw

Random-init weights (no licensed checkpoints exist here): the rehearsal
proves the CLI plumbing, compile, and protocol chain run on the chip; the
NUMBERS are pinned elsewhere (frozen-shard goldens + chip parity script).

Run: timeout 1500 python scripts/exp_cli_rehearsal2_chip.py [2|5|all]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def config2(root):
    from metro_pose3d_tpu.data.synth_shard import write_synthetic_h36m_shard
    from metro_pose3d_tpu.main import main

    write_synthetic_h36m_shard(root)
    pred = os.path.join(root, "preds_h36m.npz")
    t0 = time.perf_counter()
    rc = main([
        "--test", "--data.dataset=h36m", f"--data.data_root={root}",
        f"--eval.pred_path={pred}", "--eval.batch_size=16",
        f"--train.logdir={root}/log2",
    ])
    print(f"config2 --test rc={rc} wall={time.perf_counter()-t0:.1f}s", flush=True)
    assert rc == 0
    rc = main(["--eval-h36m", f"--eval.pred_path={pred}"])
    assert rc == 0
    import numpy as np
    d = np.load(pred, allow_pickle=True)
    print("config2 dump keys:", sorted(d.keys()), flush=True)
    assert "pose3d_abs" in d and "actions" in d


def config5(root):
    from metro_pose3d_tpu.data.synth_shard import write_synthetic_3dpw_release
    from metro_pose3d_tpu.main import main

    write_synthetic_3dpw_release(root)
    pred = os.path.join(root, "preds_3dpw.npz")
    t0 = time.perf_counter()
    rc = main([
        "--test-multiperson", "--data.dataset=3dpw",
        f"--data.data_root={root}", f"--eval.pred_path={pred}",
        f"--train.logdir={root}/log5",
        "--model.num_joints=24",  # 3DPW GT is the SMPL-24 skeleton
    ])
    print(f"config5 --test-multiperson rc={rc} wall={time.perf_counter()-t0:.1f}s",
          flush=True)
    assert rc == 0
    rc = main(["--eval-3dpw", f"--eval.pred_path={pred}"])
    assert rc == 0


def run():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    root = tempfile.mkdtemp(prefix="cli_rehearse_")
    print("root:", root, flush=True)
    if which in ("2", "all"):
        config2(root)
    if which in ("5", "all"):
        config5(root)
    print("CLI rehearsal OK:", which, flush=True)


if __name__ == "__main__":
    run()
