"""MPII prepare-layout smoke (VERDICT r2 next-round #9): synthetic official
RELEASE .mat -> scripts/prepare_mpii.py -> annotations.npz -> data/mpii.py
builder -> 2D joint remap into a mixed 2D/3D batch -> the 2D-only loss
masking holds end-to-end."""
import os
import subprocess
import sys

import numpy as np
import pytest

from metro_pose3d_tpu.config import Config, apply_overrides

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mpii_root(tmp_path_factory):
    from metro_pose3d_tpu.data.synth_shard import write_synthetic_mpii_release

    root = str(tmp_path_factory.mktemp("mpii_shard"))
    write_synthetic_mpii_release(root)
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "prepare_mpii.py"),
         "--data-root", root],
        capture_output=True, text=True, env=env,
    )
    assert out.returncode == 0, out.stderr
    return root


class TestPrepareLayoutContract:
    def test_instance_parsing(self, mpii_root):
        ann = np.load(os.path.join(mpii_root, "mpii", "annotations.npz"),
                      allow_pickle=True)
        # 6 train images x 1 annotated person + 1 extra on image 1; the
        # annotation-free rect, the 1-joint rect, and the withheld test
        # image are all skipped
        assert len(ann["image_paths"]) == 7
        assert ann["coords2d"].shape == (7, 16, 2)
        assert ann["valid"].shape == (7, 16)
        assert ann["bboxes"].shape == (7, 4)
        assert ann["valid"].sum(1).min() >= 2
        # the objpos-free second person's box falls back to the joint extent
        assert np.all(ann["bboxes"][:, 2:] > 0)

    def test_builder_examples(self, mpii_root):
        from metro_pose3d_tpu.data.mpii import MpiiDataset

        ds = MpiiDataset(mpii_root)
        assert ds.n_train == 7 and ds.n_test == 0
        ex = ds.train_example(0)
        assert ex.world_coords is None  # 2D-only
        assert ex.image_coords.shape == (16, 2)
        assert ex.image.shape == (360, 480, 3)
        assert ex.joint_validity.sum() >= 2
        with pytest.raises(IndexError):
            ds.test_example(0)


class TestMixedBatchLossMasking:
    def test_2d_rows_never_touch_the_3d_loss(self, mpii_root):
        import jax.numpy as jnp

        from metro_pose3d_tpu.data.mpii import MpiiDataset
        from metro_pose3d_tpu.data.synthetic import SyntheticDataset
        from metro_pose3d_tpu.models.losses import compute_losses
        from metro_pose3d_tpu.train.trainer import mixed_batch_iterator

        cfg = apply_overrides(Config(), {
            "model.backbone": "tiny", "model.proc_side": "64",
            "model.depth": "4", "model.compute_dtype": "float32",
            "data.source_side": "128", "data.workers": "2",
            "train.batch_size": "4", "train.batch_size_2d": "2",
        })
        ds3d = SyntheticDataset(n_train=8, imshape=(256, 256))
        ds2d = MpiiDataset(mpii_root)
        batch = next(mixed_batch_iterator(cfg, ds3d, ds2d))
        np.testing.assert_array_equal(batch["is_3d"], [1, 1, 1, 1, 0, 0])
        # remapped into the 17-joint space; 3D validity empty on 2D rows
        assert batch["coords2d_true"].shape == (6, 17, 2)
        assert batch["joint_validity"][4:].sum() == 0
        assert batch["joint_validity_2d"][4:].sum() > 0
        # MPII has no 'htop'-equivalent for... (spine) -> those joints are
        # invalid after remap on every 2D row
        from metro_pose3d_tpu.geom.joints import H36M_17, MPII_16
        from metro_pose3d_tpu.train.joint_mapping import name_mapping

        m = name_mapping(MPII_16, H36M_17)
        unmapped = np.asarray(m) < 0
        assert batch["joint_validity_2d"][4:, unmapped].sum() == 0

        # end-to-end masking: perturbing the 3D GT of the 2D rows must not
        # change any loss term
        rng = np.random.default_rng(0)
        j = batch["coords3d_true"].shape[1]
        hs = cfg.model.heatmap_side
        l3d = jnp.asarray(
            rng.normal(0, 1, (6, hs, hs, cfg.model.depth, j)), jnp.float32)
        l2d = jnp.asarray(rng.normal(0, 1, (6, hs, hs, j)), jnp.float32)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        total, parts = compute_losses(l3d, l2d, jb, cfg)
        perturbed = dict(jb)
        perturbed["coords3d_true"] = jb["coords3d_true"].at[4:, 5].add(500.0)
        total_p, parts_p = compute_losses(l3d, l2d, perturbed, cfg)
        np.testing.assert_allclose(float(total), float(total_p), rtol=1e-6)
        # while the same single-joint perturbation on a 3D row DOES change it
        perturbed3 = dict(jb)
        perturbed3["coords3d_true"] = jb["coords3d_true"].at[:4, 5].add(500.0)
        total_3, _ = compute_losses(l3d, l2d, perturbed3, cfg)
        assert abs(float(total_3) - float(total)) > 1e-3
