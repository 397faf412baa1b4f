"""Golden numeric regression tests (SURVEY.md §5.1).

A fixed-seed tiny model + a fixed synthetic batch through the REAL host
pipeline -> the fused predict graph; outputs are pinned against values
stored in tests/golden/predict_golden.npz. Any refactor that silently
changes pipeline or decode numerics (warp params, normalization, soft-argmax,
TTA averaging, LSQ reconstruction) trips these to 5e-4 mm/px.

Regenerate intentionally with:
    python tests/test_golden.py --regen
(then inspect the diff before committing).
"""
import os
import sys

if __name__ == "__main__" and "--regen" in sys.argv:
    # goldens are CPU-numerics (the suite runs on the virtual CPU mesh);
    # the platform must be forced BEFORE any jax-touching import — package
    # modules create module-level arrays, and this image's sitecustomize
    # ignores the JAX_PLATFORMS env var
    os.environ["JAX_PLATFORMS"] = "cpu"
    # ...and under the SAME 8-virtual-device pool as conftest.py: the
    # device count changes f32 reduction order enough to move the LSQ
    # reconstruction by ~1e-3 mm
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metro_pose3d_tpu.config import Config, apply_overrides
from metro_pose3d_tpu.data.synthetic import SyntheticDataset
from metro_pose3d_tpu.evaluation.engine import make_predict_fn
from metro_pose3d_tpu.geom.joints import H36M_17
from metro_pose3d_tpu.models.metro import MetroModel
from metro_pose3d_tpu.pipeline.loader import prepare_one, stack_examples

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "predict_golden.npz")


def _build():
    cfg = apply_overrides(Config(), {
        "model.backbone": "tiny", "model.proc_side": "64", "model.depth": "4",
        "model.compute_dtype": "float32", "data.source_side": "128",
    })
    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(1234),
        jnp.zeros((1, 64, 64, 3), jnp.float32), train=False,
    )
    ds = SyntheticDataset(n_train=8, n_test=8, seed=77)
    prepared = [
        prepare_one(ds.test_example(i), ds.joint_info, 64, 128, None, (0, 0, i), 4)
        for i in range(4)
    ]
    batch = {k: jnp.asarray(v) for k, v in stack_examples(prepared).items()}
    return cfg, variables, batch


def _predict(cfg, variables, batch, flip_tta):
    fn = make_predict_fn(
        cfg, H36M_17.mirror_mapping, root_index=0,
        flip_tta=flip_tta, reconstruct=True, from_tiles=True,
    )
    out = fn(variables, batch)
    return {k: np.asarray(v) for k, v in out.items()}


def _compute_all():
    cfg, variables, batch = _build()
    plain = _predict(cfg, variables, batch, flip_tta=False)
    tta = _predict(cfg, variables, batch, flip_tta=True)
    return {
        **{f"plain_{k}": v for k, v in plain.items()},
        **{f"tta_{k}": v for k, v in tta.items()},
    }


@pytest.mark.skipif(not os.path.exists(GOLDEN_PATH), reason="no golden file")
def test_predict_matches_golden():
    golden = dict(np.load(GOLDEN_PATH))
    got = _compute_all()
    assert set(got) == set(golden)
    for key in sorted(golden):
        np.testing.assert_allclose(
            got[key], golden[key], atol=5e-4, rtol=5e-4,
            err_msg=f"golden drift in {key}",
        )


def test_flip_tta_consistency():
    """TTA output must be the average of plain and unflipped-mirror passes —
    structural property independent of the stored golden."""
    got = _compute_all()
    # A mirror-symmetric model would give tta == plain; a random model must
    # differ, but remain in the same value range (averaging, not garbage).
    d = np.abs(got["tta_pose3d_rootrel"] - got["plain_pose3d_rootrel"])
    assert d.max() > 1e-3
    assert np.abs(got["tta_pose3d_rootrel"]).max() <= np.abs(
        got["plain_pose3d_rootrel"]
    ).max() * 1.5 + 1.0


if __name__ == "__main__":
    if "--regen" in sys.argv:  # platform already forced at the top
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, **_compute_all())
        print(f"wrote {GOLDEN_PATH}")
