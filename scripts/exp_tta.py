"""TTA-throughput probes (VERDICT r1 item 2): batch scaling + XLA flags.

Usage: timeout 580 python scripts/exp_tta.py [bs] [extra_xla_flags]
Runs ONE config per process (XLA_FLAGS must precede backend init).
"""
import os
import sys

if len(sys.argv) > 2 and sys.argv[2]:
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " " + sys.argv[2]

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    from metro_pose3d_tpu.config import Config
    from metro_pose3d_tpu.evaluation.engine import make_predict_fn
    from metro_pose3d_tpu.geom.joints import H36M_17
    from metro_pose3d_tpu.models.metro import MetroModel

    cfg = Config()
    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False)
    rng = np.random.RandomState(0)
    crops = jnp.asarray(rng.randint(0, 256, (bs, 256, 256, 3)), jnp.uint8)
    intr = jnp.tile(jnp.asarray(
        [[1200.0, 0, 127.5], [0, 1200.0, 127.5], [0, 0, 1.0]], jnp.float32)[None],
        (bs, 1, 1))
    for tta in (True, False):
        fn = make_predict_fn(cfg, H36M_17.mirror_mapping, 0, flip_tta=tta,
                             reconstruct=True)
        out = fn(variables, crops, intr)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(variables, crops, intr)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"bs{bs} tta={tta} flags='{sys.argv[2] if len(sys.argv)>2 else ''}': "
              f"{dt*1e3:7.2f} ms  {bs/dt:8.0f} crops/s")


if __name__ == "__main__":
    main()
