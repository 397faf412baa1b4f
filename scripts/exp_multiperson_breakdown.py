"""Real-chip breakdown of multi-person frame mode's per-frame cost.

Round-2 measured 34.0 ms/frame (720p x 16 people, synchronous
estimate_frame). Where does it go? Candidate costs: host param prep (3x3
algebra), frame H2D through the tunnel (2.7 MB), the fused predict
(warp + fwd TTA + decode + LSQ), the output D2H sync, and the host 2D
reprojection loop. Then: how much does PIPELINING recover (ship frame i+1
and dispatch its predict while frame i computes / syncs)?

Run: timeout 1500 python scripts/exp_multiperson_breakdown.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from metro_pose3d_tpu.config import Config, apply_overrides
    from metro_pose3d_tpu.data.synthetic import make_multiperson_frame
    from metro_pose3d_tpu.geom.joints import H36M_17
    from metro_pose3d_tpu.models.metro import MetroModel
    from metro_pose3d_tpu.multiperson import MultiPersonEstimator

    cfg = Config()  # flagship R50@256
    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3), jnp.float32),
        train=False,
    )
    est = MultiPersonEstimator(cfg, variables, H36M_17)

    # 10 distinct 720p frames, 16 people each
    frames = []
    for i in range(10):
        image, boxes, cam, _ = make_multiperson_frame(
            n_persons=16, imshape=(720, 1280), seed=i)
        frames.append((image, boxes, cam))

    # warm up every piece (compile)
    est.estimate_frame(*frames[0])

    # ---- synchronous loop (the round-2 number's protocol) ------------------
    t0 = time.perf_counter()
    for f in frames:
        est.estimate_frame(*f)
    sync_ms = (time.perf_counter() - t0) / len(frames) * 1e3
    print(f"synchronous estimate_frame: {sync_ms:8.2f} ms/frame", flush=True)

    # ---- piece timings ------------------------------------------------------
    from metro_pose3d_tpu.pipeline.crops import prepare_inference_crop_params

    image, boxes, cam = frames[0]
    n = len(boxes)

    t0 = time.perf_counter()
    for _ in range(50):
        prepared = [
            prepare_inference_crop_params(
                b, cam, cfg.model.proc_side, cfg.data.test_box_expansion)
            for b in boxes
        ]
    print(f"host param prep x{n}:      {(time.perf_counter()-t0)/50*1e3:8.2f} ms",
          flush=True)

    frame_np = np.ascontiguousarray(image[:, : image.shape[1] // 2 * 2])
    t0 = time.perf_counter()
    for _ in range(20):
        d = jax.device_put(frame_np)
        d.block_until_ready()
    print(f"frame H2D (2.7 MB):        {(time.perf_counter()-t0)/20*1e3:8.2f} ms",
          flush=True)

    # device compute alone: keep batch resident, re-run predict, sum-reduce
    for p in prepared:
        p.pop("_crop_cam")
    prepared = prepared + [prepared[-1]] * (16 - n)
    batch = {k: jnp.asarray(np.stack([p[k] for p in prepared])) for k in prepared[0]}
    batch["frame"] = jax.device_put(frame_np)
    f_sum = jax.jit(lambda v, b: jax.tree.map(
        jnp.sum, est._predict(v, b)))
    out = f_sum(est.variables, batch)
    np.asarray(out["pose3d_abs"])
    t0 = time.perf_counter()
    for _ in range(20):
        out = f_sum(est.variables, batch)
    np.asarray(out["pose3d_abs"])
    print(f"device predict (resident): {(time.perf_counter()-t0)/20*1e3:8.2f} ms",
          flush=True)

    # full predict output staged to host (the real sync cost)
    outd = est._predict(est.variables, batch)
    jax.tree.map(np.asarray, outd)
    t0 = time.perf_counter()
    for _ in range(20):
        outd = est._predict(est.variables, batch)
        jax.tree.map(np.asarray, outd)
    print(f"predict + D2H sync:        {(time.perf_counter()-t0)/20*1e3:8.2f} ms",
          flush=True)

    # ---- pipelined product API (estimate_stream) ----------------------------
    for depth in (2, 3):
        list(est.estimate_stream(iter(frames), depth=depth))  # warm
        t0 = time.perf_counter()
        outs = list(est.estimate_stream(iter(frames), depth=depth))
        pipe_ms = (time.perf_counter() - t0) / len(frames) * 1e3
        assert len(outs) == len(frames)
        print(f"estimate_stream depth={depth}:  {pipe_ms:8.2f} ms/frame "
              f"({1000/pipe_ms*16:.0f} people/s)", flush=True)


if __name__ == "__main__":
    main()
