"""Inference throughput vs output stride (the stride_test knob) on chip.

The reference's --stride-test flag trades heatmap resolution for speed;
on TPU the dilated final stage at stride 16 runs conv5 at 16x16 with
dilation 2, while stride 32 runs it at 8x8 undilated (4x fewer conv5
FLOPs) and stride 8 dilates stages 3+4 (4x MORE stage-3 spatial work).
This measures the fused predict forward (normalize -> R50@256 -> decode)
with device-resident inputs and sum-reduced outputs, ONE stride per
invocation (cold compiles through the remote-compile service are slow —
CLAUDE.md round-2 gotcha).

Run: timeout 1500 python scripts/exp_stride_infer_chip.py <stride> [bs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    stride = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    from metro_pose3d_tpu.config import Config, apply_overrides
    from metro_pose3d_tpu.models.metro import MetroModel, decode_metro

    cfg = apply_overrides(Config(), {"model.stride": str(stride)})
    model = MetroModel(cfg.model)
    side = cfg.model.proc_side
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, side, side, 3)), train=False)
    variables = jax.device_put(variables)
    crops = jax.device_put(jnp.asarray(
        np.random.RandomState(0).uniform(0, 1, (bs, side, side, 3)),
        jnp.float32))

    @jax.jit
    def fwd(v, c):
        l3, l2 = model.apply(v, c, train=False)
        p3, p2 = decode_metro(l3, l2, cfg.model)
        return jnp.sum(p3) + jnp.sum(p2)

    t0 = time.perf_counter()
    out = fwd(variables, crops)
    np.asarray(out)
    print(f"stride {stride} bs{bs}: compile+first {time.perf_counter()-t0:.1f}s")
    for _ in range(2):
        np.asarray(fwd(variables, crops))
    iters = 10
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fwd(variables, crops)
    np.asarray(acc)
    dt = (time.perf_counter() - t0) / iters
    print(f"stride {stride} bs{bs}: {dt*1e3:.1f} ms = "
          f"{bs/dt:,.0f} crops/s/chip")


if __name__ == "__main__":
    main()
