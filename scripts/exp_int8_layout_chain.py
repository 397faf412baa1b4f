"""Do the per-shape NCHW int8 conv wins COMPOSE through fused-requant chains?

exp_int8_layout.py measured single convs: NCHW beats NHWC on 7/8 R50 shapes
(1.01-1.18x). But the production int8 graph chains convs through fused
requant junctions (quantize.py QuantConv pre_affine path): an elementwise
per-channel f32 scale+round+clip on the int32 accumulator that XLA fuses
into the conv epilogue. In NHWC the per-channel broadcast is lane-aligned
(last dim); in NCHW it broadcasts over dim 1 (sublanes) — the epilogue
fusion may cost back more than the emitter win. This times full
bottleneck-block chains per R50 stage in four variants:

  nhwc_conv  - all convs NHWC                  (round-2 int8 graph)
  nhwc_dot   - NHWC 3x3 convs, 1x1s as dot     (current production:
               quantize_1x1_dot="all")
  nchw_conv  - all convs NCHW
  nchw_mixed - NCHW 3x3 convs, 1x1s as dot_general contracting dim 1
               (output lands channels-last; transpose back before 3x3)

Run: timeout 1500 python scripts/exp_int8_layout_chain.py [batch]

RESULTS (v5e, bs128, 2026-08-19, /tmp/int8_chain.log; table in DESIGN
3.2): NCHW survives composition on 3/4 stages — s2 1.08x, s4 1.15x
(mixed 1.21x), s5 1.04x; s3 loses at 0.95x. Trunk-stage sum: nhwc_dot
(production) 13.12 ms, all-nchw_conv 12.42 (-5.3%). nchw_mixed loses
badly on s2/s3 (in-block transposes). Decision taken on a full-model
A/B (model.quantize_layout), not this table.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# (name, hw, cin, cmid, n_blocks, dilation) — R50@256 trunk stages
# (constant hw per stage; the stride-2 transitions are single convs that
# the single-shape probe already covered)
STAGES = [
    ("s2 hw64 c256/m64  x3", 64, 256, 64, 3, 1),
    ("s3 hw32 c512/m128 x4", 32, 512, 128, 4, 1),
    ("s4 hw16 c1024/m256x6", 16, 1024, 256, 6, 1),
    ("s5 hw16 c2048/m512x3 d2", 16, 2048, 512, 3, 2),
]


def requant(acc, m, caxis):
    """Fused junction: int32 acc -> f32 scale -> round/clip -> int8."""
    shape = [1, 1, 1, 1]
    shape[caxis] = m.shape[0]
    y = acc.astype(jnp.float32) * m.reshape(shape)
    y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def conv(x, w, dn, stride=1, dil=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=dn, preferred_element_type=jnp.int32)


def block_nhwc(x, ws, ms, dil, use_dot):
    w1, w2, w3 = ws
    m1, m2, m3 = ms
    if use_dot:
        b, h, wdt, c = x.shape
        acc = lax.dot_general(
            x.reshape(-1, c), w1.reshape(c, -1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).reshape(b, h, wdt, -1)
    else:
        acc = conv(x, w1, ("NHWC", "HWIO", "NHWC"))
    y = requant(acc, m1, 3)
    acc = conv(y, w2, ("NHWC", "HWIO", "NHWC"), dil=dil)
    y = requant(acc, m2, 3)
    if use_dot:
        b, h, wdt, c = y.shape
        acc = lax.dot_general(
            y.reshape(-1, c), w3.reshape(c, -1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).reshape(b, h, wdt, -1)
    else:
        acc = conv(y, w3, ("NHWC", "HWIO", "NHWC"))
    return requant(acc, m3, 3)


def block_nchw(x, ws, ms, dil, mixed):
    w1, w2, w3 = ws  # OIHW for convs; [Cin, Cout] flat for dots
    m1, m2, m3 = ms
    if mixed:
        # contract channel dim in place: [B,C,H,W] x [C,F] -> [B,H,W,F]
        acc = lax.dot_general(
            x, w1.reshape(x.shape[1], -1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = requant(acc, m1, 3).transpose(0, 3, 1, 2)
    else:
        acc = conv(x, w1, ("NCHW", "OIHW", "NCHW"))
        y = requant(acc, m1, 1)
    acc = conv(y, w2, ("NCHW", "OIHW", "NCHW"), dil=dil)
    y = requant(acc, m2, 1)
    if mixed:
        acc = lax.dot_general(
            y, w3.reshape(y.shape[1], -1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return requant(acc, m3, 3).transpose(0, 3, 1, 2)
    acc = conv(y, w3, ("NCHW", "OIHW", "NCHW"))
    return requant(acc, m3, 1)


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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.RandomState(0)
    print(f"batch={b}", flush=True)
    for name, hw, cin, cmid, n_blocks, dil in STAGES:
        x_nhwc = rng.randint(-127, 128, (b, hw, hw, cin)).astype(np.int8)
        blocks = []
        for _ in range(n_blocks):
            w1 = rng.randint(-127, 128, (1, 1, cin, cmid)).astype(np.int8)
            w2 = rng.randint(-127, 128, (3, 3, cmid, cmid)).astype(np.int8)
            w3 = rng.randint(-127, 128, (1, 1, cmid, cin)).astype(np.int8)
            ms = tuple(
                (rng.rand(c).astype(np.float32) * 1e-4)
                for c in (cmid, cmid, cin))
            blocks.append(((w1, w2, w3), ms))
        flops = 2 * b * hw * hw * n_blocks * (
            cin * cmid + cmid * cmid * 9 + cmid * cin)

        res = {}
        for variant in ("nhwc_conv", "nhwc_dot", "nchw_conv", "nchw_mixed"):
            nchw = variant.startswith("nchw")
            if nchw:
                xx = jnp.asarray(np.transpose(x_nhwc, (0, 3, 1, 2)))
                wss = [
                    (tuple(jnp.asarray(np.transpose(w, (3, 2, 0, 1)))
                           if not (variant == "nchw_mixed" and w.shape[0] == 1)
                           else jnp.asarray(w) for w in ws), ms)
                    for ws, ms in blocks]
            else:
                xx = jnp.asarray(x_nhwc)
                wss = [(tuple(jnp.asarray(w) for w in ws), ms)
                       for ws, ms in blocks]
            wss = [(ws, tuple(jnp.asarray(m) for m in ms)) for ws, ms in wss]

            def f(x, wss=wss, variant=variant):
                for ws, ms in wss:
                    if variant == "nhwc_conv":
                        x = block_nhwc(x, ws, ms, dil, use_dot=False)
                    elif variant == "nhwc_dot":
                        x = block_nhwc(x, ws, ms, dil, use_dot=True)
                    elif variant == "nchw_conv":
                        x = block_nchw(x, ws, ms, dil, mixed=False)
                    else:
                        x = block_nchw(x, ws, ms, dil, mixed=True)
                return jnp.sum(x.astype(jnp.int32))

            try:
                res[variant] = timeit(jax.jit(f), xx)
            except Exception as e:  # noqa: BLE001
                res[variant] = None
                print(f"{name:26s} {variant}: FAIL "
                      f"{str(e).splitlines()[0][:90]}", flush=True)

        base = res.get("nhwc_dot") or res.get("nhwc_conv")
        parts = [name.ljust(26)]
        for variant in ("nhwc_conv", "nhwc_dot", "nchw_conv", "nchw_mixed"):
            t = res.get(variant)
            if t is None:
                parts.append(f"{variant} FAIL")
                continue
            parts.append(
                f"{variant} {t*1e3:7.3f}ms ({flops/t/1e12:5.1f}T"
                f"{'' if base is None else f', {base/t:4.2f}x'})")
        print("  ".join(parts), flush=True)


if __name__ == "__main__":
    main()
