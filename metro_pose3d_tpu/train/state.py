"""Training state: params, BN statistics, optimizer state, step counter."""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from metro_pose3d_tpu.config import Config
from metro_pose3d_tpu.models.metro import MetroModel


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(cfg: Config, tx: optax.GradientTransformation, rng=None) -> TrainState:
    """Initialize model + optimizer state (host or device, caller shards)."""
    if rng is None:
        rng = jax.random.PRNGKey(cfg.train.seed)
    model = MetroModel(cfg.model.at_phase(train=True))
    dummy = jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3), jnp.float32)
    variables = model.init(rng, dummy, train=True)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    if cfg.train.backbone_init:
        # ImageNet warm start (converted via utils/convert_backbone.py)
        from metro_pose3d_tpu.utils.convert_backbone import (
            apply_backbone_init, load_backbone_npz,
        )

        bp, bs = load_backbone_npz(cfg.train.backbone_init)
        params, batch_stats = apply_backbone_init(params, batch_stats, bp, bs)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
