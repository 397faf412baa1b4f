"""Model export / import: a frozen crop-in -> skeleton-out inference bundle.

Responsibility-parity with the reference's `--export-file` frozen-graph path
(SURVEY.md §4.5), the JAX way: the bundle is (config.json, params.msgpack);
`load_exported` rebuilds the fused jit predict function. `aot_compile` also
ahead-of-time-lowers the graph for a fixed batch shape so first-call latency
on the serving chip is load-time, not request-time.
"""
from __future__ import annotations

import dataclasses
import json
import os

import flax.serialization
import jax
import jax.numpy as jnp

from metro_pose3d_tpu.config import Config, apply_overrides
from metro_pose3d_tpu.evaluation.engine import make_predict_fn
from metro_pose3d_tpu.geom.joints import get_joint_info


def export_model(cfg: Config, variables, out_dir: str, joint_info_name="h36m_17"):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(
            {"config": dataclasses.asdict(cfg), "joint_info": joint_info_name}, f, indent=2
        )
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(variables)))
    return out_dir


def load_exported(out_dir: str, flip_tta: bool | None = None):
    """-> (cfg, variables, predict_fn(variables, crops_uint8, intrinsics))."""
    with open(os.path.join(out_dir, "config.json")) as f:
        meta = json.load(f)
    flat = {}
    for section, fields in meta["config"].items():
        for name, value in fields.items():
            flat[f"{section}.{name}"] = str(value)
    cfg = apply_overrides(Config(), flat)
    ji = get_joint_info(meta["joint_info"])

    from metro_pose3d_tpu.models.metro import MetroModel

    model = MetroModel(cfg.model.at_phase(train=False))
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3), jnp.float32),
        train=False,
    )
    with open(os.path.join(out_dir, "params.msgpack"), "rb") as f:
        variables = flax.serialization.from_bytes(template, f.read())
    root = ji.names.index("pelv") if "pelv" in ji.names else 0
    fn = make_predict_fn(cfg, ji.mirror_mapping, root_index=root, flip_tta=flip_tta)
    return cfg, variables, fn


def aot_compile(fn, variables, batch_size: int, proc_side: int):
    """AOT-lower the predict fn for a fixed shape (serving cold-start)."""
    crops = jax.ShapeDtypeStruct((batch_size, proc_side, proc_side, 3), jnp.uint8)
    intr = jax.ShapeDtypeStruct((batch_size, 3, 3), jnp.float32)
    return jax.jit(fn).lower(variables, crops, intr).compile()
