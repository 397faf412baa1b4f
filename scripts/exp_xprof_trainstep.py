"""Op-level xprof breakdown of the flagship train step (real chip).

DESIGN §3.3's backward decomposition came from stage-truncation probes;
this captures an XLA profiler trace of 3 steady-state fused train steps
(R50@256 bs256, device-resident batch) and aggregates the device trace
events by fusion/op name — the op-level confirmation of where the 2.4-3x
bwd-conv emitter time sits.

Run: timeout 1500 python scripts/exp_xprof_trainstep.py [bs]
"""
import collections
import glob
import gzip
import json
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def capture(bs: int, trace_dir: str):
    import dataclasses

    from metro_pose3d_tpu.config import Config
    from metro_pose3d_tpu.models.metro import MetroModel
    from metro_pose3d_tpu.train.loop import make_optimizer, make_train_step
    from metro_pose3d_tpu.train.state import TrainState

    cfg = Config()
    rng = np.random.RandomState(0)
    side, tile, j = cfg.model.proc_side, cfg.data.source_side, cfg.model.num_joints

    sys.path.insert(0, "/root/repo/scripts")
    from bench_device import make_batch

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
    state, m = step_fn(state, batch)  # compile
    jax.device_get(m)

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, m = step_fn(state, batch)
    jax.device_get(m)
    jax.profiler.stop_trace()


def aggregate(trace_dir: str, n_steps: int = 3):
    """Per-step device table: hlo_category (with achieved GB/s + TFLOP/s
    from the trace's raw_bytes_accessed/model_flops) and tf_op module."""
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print("no trace.json.gz found under", trace_dir)
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e.get("tid")): e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    cat = collections.Counter()
    catb = collections.Counter()
    catf = collections.Counter()
    mod = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if pids.get(e["pid"]) != "/device:TPU:0":
            continue
        if tids.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        a = e.get("args", {})
        c = a.get("hlo_category", "?")
        cat[c] += e["dur"]
        total += e["dur"]
        catb[c] += int(a.get("raw_bytes_accessed", 0) or 0)
        catf[c] += int(a.get("model_flops", 0) or 0)
        parts = a.get("tf_op", "?").split("/")
        mod["/".join(parts[1:3]) if len(parts) > 2 else a.get("tf_op", "?")] += e["dur"]

    print(f"\ndevice XLA-Ops total: {total/n_steps/1e3:.1f} ms/step")
    print("by hlo_category (per step; achieved rates from trace counters):")
    for k, v in cat.most_common(10):
        gbps = catb[k] / (v * 1e-6) / 1e9 if v else 0
        tfs = catf[k] / (v * 1e-6) / 1e12 if v else 0
        print(f"  {v/n_steps/1e3:8.2f} ms {100*v/total:5.1f}%  "
              f"{gbps:6.0f} GB/s {tfs:6.1f} TF/s  {k}")
    print("by tf_op module (top 12, per step):")
    for k, v in mod.most_common(12):
        print(f"  {v/n_steps/1e3:8.2f} ms {100*v/total:5.1f}%  {k}")


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    trace_dir = tempfile.mkdtemp(prefix="xprof_train_")
    print("capturing bs", bs, "->", trace_dir, flush=True)
    capture(bs, trace_dir)
    aggregate(trace_dir)


if __name__ == "__main__":
    main()
