"""Real-chip timing: direct packed warp vs two-pass XLA vs two-pass Pallas.

Production shape: B=256 tiles 512^2 -> 256^2 crops. Outputs are sum-reduced
so only compute is timed (axon stages jit outputs per call — CLAUDE.md).
Run: timeout 580 python scripts/exp_twopass_chip.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    B, T, S = 256, 512, 256
    rng = np.random.RandomState(0)
    tiles = jnp.asarray(rng.randint(0, 256, (B, T, T, 3)), jnp.uint8)
    hs = []
    for i in range(B):
        ang = rng.uniform(-0.5, 0.5)
        sc = rng.uniform(0.8, 1.8)
        c, s = np.cos(ang), np.sin(ang)
        a = np.array([[sc * c, -sc * s], [sc * s, sc * c]])
        centre_src = np.array([T / 2, T / 2]) + rng.uniform(-20, 20, 2)
        t = centre_src - a @ np.array([S / 2, S / 2])
        hmat = np.eye(3)
        hmat[:2, :2] = a
        hmat[:2, 2] = t
        hmat[2, :2] = rng.uniform(-1, 1, 2) * 2e-4
        hs.append(hmat)
    h = jnp.asarray(np.stack(hs), jnp.float32)
    k = jnp.tile(jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)[None], (B, 1))
    d = jnp.zeros((B, 5), jnp.float32)

    from metro_pose3d_tpu.ops import warp as W
    from metro_pose3d_tpu.ops.warp_twopass import warp_images_twopass_xla
    from metro_pose3d_tpu.ops.warp_pallas import warp_images_twopass_pallas

    outs = {}
    for name, fn in [
        ("pallas_twopass", warp_images_twopass_pallas),
        ("xla_twopass", warp_images_twopass_xla),
        ("direct_packed", W._warp_images_packed),
    ]:
        f = jax.jit(lambda t_, h_, k_, d_, fn=fn: jnp.sum(fn(t_, h_, k_, d_, S)))
        try:
            outs[name] = float(np.asarray(f(tiles, h, k, d)))
            dt = timeit(f, tiles, h, k, d)
            print(f"{name:16s}: {dt*1e3:8.2f} ms  {B/dt:9.0f} crops/s  sum={outs[name]:.6g}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:160]}")

    # value agreement spot check (sum over identical inputs)
    if "pallas_twopass" in outs and "direct_packed" in outs:
        rel = abs(outs["pallas_twopass"] - outs["direct_packed"]) / abs(outs["direct_packed"])
        print(f"sum rel diff pallas vs direct: {rel:.2e}")

    # distortion config (Newton path)
    dd = jnp.tile(jnp.asarray([-0.15, 0.03, 5e-4, -5e-4, 0.01], jnp.float32)[None], (B, 1))
    f_n = float(T)
    pre = np.array([[1 / f_n, 0, -T / 2 / f_n], [0, 1 / f_n, -T / 2 / f_n], [0, 0, 1]])
    h2 = jnp.asarray(np.stack([pre @ np.asarray(x) for x in np.asarray(h)]), jnp.float32)
    k2 = jnp.tile(jnp.asarray([f_n, f_n, T / 2, T / 2], jnp.float32)[None], (B, 1))
    f = jax.jit(lambda t_, h_, k_, d_: jnp.sum(warp_images_twopass_pallas(t_, h_, k_, d_, S)))
    try:
        np.asarray(f(tiles, h2, k2, dd))
        dt = timeit(f, tiles, h2, k2, dd)
        print(f"pallas w/ dist   : {dt*1e3:8.2f} ms  {B/dt:9.0f} crops/s")
    except Exception as e:  # noqa: BLE001
        print(f"pallas w/ dist   : FAIL {type(e).__name__}: {str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
