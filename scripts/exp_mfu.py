"""Roofline for VERDICT r1 weak #2: where does the predict graph spend time,
what MFU is the conv body achieving, and what would flip-TTA >= 5k need?

Run: timeout 580 python scripts/exp_mfu.py [bs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 394e12 / 2  # 197 TFLOP/s bf16 per chip (v5e)


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out) if not isinstance(out, (tuple, dict)) else jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out) if not isinstance(out, (tuple, dict)) else jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    from metro_pose3d_tpu.config import Config
    from metro_pose3d_tpu.evaluation.engine import make_predict_fn
    from metro_pose3d_tpu.geom.joints import H36M_17
    from metro_pose3d_tpu.models.metro import MetroModel, decode_metro

    cfg = Config()
    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32), train=False
    )
    rng = np.random.RandomState(0)
    crops_u8 = jnp.asarray(rng.randint(0, 256, (bs, 256, 256, 3)), jnp.uint8)
    crops = (crops_u8.astype(jnp.float32) / 255.0 - 0.5) * 2.0
    intr = jnp.tile(
        jnp.asarray([[1200.0, 0, 127.5], [0, 1200.0, 127.5], [0, 0, 1.0]], jnp.float32)[None],
        (bs, 1, 1),
    )

    # 1. model fwd only (sum-reduced)
    def fwd_once(v, c):
        l3, l2 = model.apply(v, c, train=False)
        return jnp.sum(l3) + jnp.sum(l2)
    f_fwd = jax.jit(fwd_once)
    dt_fwd = timeit(f_fwd, variables, crops)
    lowered = jax.jit(fwd_once).lower(variables, crops)
    try:
        ca = lowered.compile().cost_analysis()
        flops = ca.get("flops", float("nan")) if isinstance(ca, dict) else ca[0].get("flops")
    except Exception as e:  # noqa: BLE001
        flops = float("nan")
        print("cost_analysis failed:", str(e)[:120])
    print(f"fwd bs{bs}: {dt_fwd*1e3:7.2f} ms  {bs/dt_fwd:8.0f} crops/s  "
          f"flops/crop={flops/bs/1e9 if flops==flops else float('nan'):.2f} G  "
          f"MFU={(flops/dt_fwd)/V5E_BF16_PEAK*100 if flops==flops else float('nan'):.1f}%")

    # 2. fwd + decode
    def fwd_decode(v, c):
        l3, l2 = model.apply(v, c, train=False)
        p3, p2 = decode_metro(l3, l2, cfg.model)
        return jnp.sum(p3) + jnp.sum(p2)
    dt_dec = timeit(jax.jit(fwd_decode), variables, crops)
    print(f"fwd+decode:  {dt_dec*1e3:7.2f} ms (+{(dt_dec-dt_fwd)*1e3:.2f})")

    # 3. full predict (normalize..reconstruct), no TTA / TTA
    for tta in (False, True):
        fn = make_predict_fn(cfg, H36M_17.mirror_mapping, 0, flip_tta=tta, reconstruct=True)
        out = fn(variables, crops_u8, intr); jax.block_until_ready(out)
        dt = timeit(fn, variables, crops_u8, intr, iters=10)
        print(f"predict tta={tta}: {dt*1e3:7.2f} ms  {bs/dt:8.0f} crops/s")

    # 4. stage ablation: backbone trunk only
    from metro_pose3d_tpu.models.resnet import ResNet
    bb = ResNet(variant=cfg.model.backbone, output_stride=cfg.model.stride,
                preact=cfg.model.preactivation, dtype=jnp.bfloat16,
                conv_padding=cfg.model.conv_padding,
                stride_position=cfg.model.stride_position,
                v2_biases=cfg.model.v2_biases)
    bvars = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), False)
    f_bb = jax.jit(lambda v, c: jnp.sum(bb.apply(v, c, False)))
    dt_bb = timeit(f_bb, bvars, crops)
    try:
        ca = jax.jit(lambda v, c: jnp.sum(bb.apply(v, c, False))).lower(bvars, crops).compile().cost_analysis()
        bflops = ca.get("flops", float("nan")) if isinstance(ca, dict) else float("nan")
    except Exception:
        bflops = float("nan")
    print(f"backbone only: {dt_bb*1e3:7.2f} ms  {bs/dt_bb:8.0f} crops/s  "
          f"MFU={(bflops/dt_bb)/V5E_BF16_PEAK*100 if bflops==bflops else float('nan'):.1f}%")


if __name__ == "__main__":
    main()
