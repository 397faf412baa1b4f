"""XLA compiler-flag sweep on the fused train step (VERDICT r4 next-#8).

The backward pass is ~70% of the 206.5 ms bs256 train step (DESIGN §3.3)
and "emitter-bound" had only ever been asserted at DEFAULT compiler flags.
This sweep re-times the production fused step (augment+fwd+bwd+Adam,
R50@256) under the publicly tunable TPU XLA knobs. XLA flags bind at
backend init, so every config runs in its own subprocess (reusing
scripts/exp_trainstep_decompose.py's "full" section); each cold compile
through the remote-compile service costs 3-10 min — run in background.

Run: python scripts/exp_xla_flags.py [bs] [--configs=a,b,...]
Results: one line per config + JSON table at /tmp/xla_flags_sweep.json.
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Candidate knobs. Unrecognized flags hard-fail the subprocess — that shows
# up as an "error" row, not a crash of the sweep.
CONFIGS = {
    "default": "",
    # latency-hiding scheduler: overlaps (DMA) prefetch with compute; mostly
    # a collectives feature but also reorders HBM prefetch single-core
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    # larger scoped-vmem budget lets the fuser form bigger fusions around
    # convolutions (default budget is conservative)
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    # both together
    "lhs+vmem32m": ("--xla_tpu_enable_latency_hiding_scheduler=true "
                    "--xla_tpu_scoped_vmem_limit_kib=32768"),
}


def main():
    bs = next((int(a) for a in sys.argv[1:] if a.isdigit()), 256)
    sel = next((a.split("=", 1)[1].split(",") for a in sys.argv[1:]
                if a.startswith("--configs=")), list(CONFIGS))
    results = {}
    for name in sel:
        flags = CONFIGS[name]
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        # each config gets its own persistent-cache dir: the cache key may
        # not cover every debug-option flag, and a false hit would time the
        # WRONG binary
        env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/jax_cc_flags_{name.replace('+','_')}"
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/exp_trainstep_decompose.py"),
             str(bs), "full"],
            capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)
        wall = time.time() - t0
        m = re.search(r"full train step:\s*([\d.]+) ms", proc.stdout)
        if m:
            ms = float(m.group(1))
            results[name] = {"step_ms": ms, "crops_per_s": round(bs / ms * 1e3, 1),
                             "wall_s": round(wall, 1), "flags": flags}
            print(f"[{name}] {ms:.1f} ms/step = {bs/ms*1e3:,.0f} crops/s "
                  f"(wall {wall:.0f}s)", flush=True)
        else:
            err = (proc.stderr or proc.stdout).strip()[-300:]
            results[name] = {"error": err, "wall_s": round(wall, 1), "flags": flags}
            print(f"[{name}] FAILED after {wall:.0f}s: ...{err[-120:]}", flush=True)
        with open("/tmp/xla_flags_sweep.json", "w") as f:
            json.dump({"batch_size": bs, "results": results}, f, indent=2)
    print(json.dumps({"batch_size": bs, "results": results}))


if __name__ == "__main__":
    main()
