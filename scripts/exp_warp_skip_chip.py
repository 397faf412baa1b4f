"""Real-chip A/B: range-skip two-pass warp kernel vs the round-3 baseline.

Shapes:
  1. bs256 512^2 -> 256^2 per-crop tiles (training/eval shape; crops cover
     ~60-90% of the tile, so 0-1 of 4 row chunks skip)
  2. frame mode: 768x1280 padded 720p frame, 16 crops of ~256-320 px person
     boxes (each crop touches ~2-3 of 6 row chunks and ~2-3 of 10 column
     chunks — the skip's design case)
Parity: elementwise |skip - noskip| max on chip (contract: <= 1 LSB, rare).

Run: timeout 1200 python scripts/exp_warp_skip_chip.py  (background; one
cold Mosaic compile per variant)
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


def crop_params(rng, b, tile_hw, side, spread=20.0, scale=(0.8, 1.8),
                centers=None):
    th, tw = tile_hw
    hs = []
    for i in range(b):
        ang = rng.uniform(-0.5, 0.5)
        sc = rng.uniform(*scale)
        c, s = np.cos(ang), np.sin(ang)
        a = np.array([[sc * c, -sc * s], [sc * s, sc * c]])
        if centers is None:
            centre_src = np.array([tw / 2, th / 2]) + rng.uniform(-spread, spread, 2)
        else:
            centre_src = np.asarray(centers[i], np.float64)
        t = centre_src - a @ np.array([side / 2, side / 2])
        hmat = np.eye(3)
        hmat[:2, :2] = a
        hmat[:2, 2] = t
        hmat[2, :2] = rng.uniform(-1, 1, 2) * 2e-4
        hs.append(hmat)
    h = jnp.asarray(np.stack(hs), jnp.float32)
    k = jnp.tile(jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)[None], (b, 1))
    d = jnp.zeros((b, 5), jnp.float32)
    return h, k, d


def main():
    from metro_pose3d_tpu.ops.warp_pallas import warp_images_twopass_pallas

    rng = np.random.RandomState(0)

    # ---- case 1: per-crop tiles, bs256 512^2 -> 256^2 ----------------------
    B, T, S = 256, 512, 256
    tiles = jnp.asarray(rng.randint(0, 256, (B, T, T, 3)), jnp.uint8)
    h, k, d = crop_params(rng, B, (T, T), S)

    for name, skip in (("noskip", False), ("skip", True)):
        f = jax.jit(lambda t_, h_, k_, d_, sk=skip: jnp.sum(
            warp_images_twopass_pallas(t_, h_, k_, d_, S, skip_ranges=sk)))
        try:
            val = float(np.asarray(f(tiles, h, k, d)))
            dt = timeit(f, tiles, h, k, d)
            print(f"crop {name:7s}: {dt*1e3:8.2f} ms  {B/dt:9.0f} crops/s  sum={val:.6g}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"crop {name:7s}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:200]}",
                  flush=True)
            if skip:
                return

    # elementwise parity on chip
    g = jax.jit(lambda t_, h_, k_, d_: jnp.max(jnp.abs(
        warp_images_twopass_pallas(t_, h_, k_, d_, S, skip_ranges=True)
        - warp_images_twopass_pallas(t_, h_, k_, d_, S, skip_ranges=False))))
    md = float(np.asarray(g(tiles, h, k, d)))
    cnt = jax.jit(lambda t_, h_, k_, d_: jnp.sum((jnp.abs(
        warp_images_twopass_pallas(t_, h_, k_, d_, S, skip_ranges=True)
        - warp_images_twopass_pallas(t_, h_, k_, d_, S, skip_ranges=False)) > 0)
        .astype(jnp.int32)))
    nd = int(np.asarray(cnt(tiles, h, k, d)))
    print(f"crop parity: max |skip-noskip| = {md:.3g}, differing elems = "
          f"{nd}/{B*S*S*3} ({nd/(B*S*S*3):.2e})", flush=True)

    # ---- case 1b: distortion + Newton ---------------------------------------
    dd = jnp.tile(jnp.asarray([-0.15, 0.03, 5e-4, -5e-4, 0.01], jnp.float32)[None], (B, 1))
    fno = float(T)
    pre = np.array([[1 / fno, 0, -T / 2 / fno], [0, 1 / fno, -T / 2 / fno], [0, 0, 1]])
    h2 = jnp.asarray(np.stack([pre @ np.asarray(x) for x in np.asarray(h)]), jnp.float32)
    k2 = jnp.tile(jnp.asarray([fno, fno, T / 2, T / 2], jnp.float32)[None], (B, 1))
    for name, skip in (("noskip", False), ("skip", True)):
        f = jax.jit(lambda t_, h_, k_, d_, sk=skip: jnp.sum(
            warp_images_twopass_pallas(t_, h_, k_, d_, S, skip_ranges=sk)))
        val = float(np.asarray(f(tiles, h2, k2, dd)))
        dt = timeit(f, tiles, h2, k2, dd)
        print(f"dist {name:7s}: {dt*1e3:8.2f} ms  {B/dt:9.0f} crops/s  sum={val:.6g}",
              flush=True)

    # ---- case 2: frame mode, 768x1280, 16 person crops ---------------------
    TH, TW, NB = 768, 1280, 16
    frame = jnp.asarray(rng.randint(0, 256, (1, TH, TW, 3)), jnp.uint8)
    centers = np.stack([rng.uniform(160, TW - 160, NB),
                        rng.uniform(160, TH - 160, NB)], axis=1)
    hf, kf, df = crop_params(rng, NB, (TH, TW), S, scale=(0.9, 1.3),
                             centers=centers)
    for name, skip in (("noskip", False), ("skip", True)):
        f = jax.jit(lambda fr, h_, k_, d_, sk=skip: jnp.sum(
            warp_images_twopass_pallas(fr, h_, k_, d_, S, skip_ranges=sk)))
        val = float(np.asarray(f(frame, hf, kf, df)))
        dt = timeit(f, frame, hf, kf, df)
        print(f"frame {name:7s}: {dt*1e3:8.2f} ms  {NB/dt:9.0f} crops/s  sum={val:.6g}",
              flush=True)


if __name__ == "__main__":
    main()
