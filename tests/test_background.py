"""3DHP green-screen background replacement (SURVEY.md §3 "Background aug").

The composite happens in source-tile space BEFORE the crop warp (one fused
elementwise lerp, no second homography gather) — these tests pin the
host mask-tile extraction, the device composite, and the end-to-end effect
on the final crop.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from metro_pose3d_tpu.config import AugConfig
from metro_pose3d_tpu.data.synthetic import make_example
from metro_pose3d_tpu.geom.joints import H36M_17
from metro_pose3d_tpu.ops.color import composite_background
from metro_pose3d_tpu.pipeline.crops import AugParams, prepare_example
from metro_pose3d_tpu.pipeline.device import device_augment
from metro_pose3d_tpu.pipeline.loader import prepare_one, stack_examples


def _aug(bg_enabled, bg_index=2):
    return AugParams(
        shift=np.zeros(2), scale=1.0, rot_rad=0.0, flip=False,
        brightness=0.0, contrast=1.0, saturation=1.0, hue=0.0,
        occlude=False, occluder_index=0,
        occluder_affine=np.array([[1.0, 0, 1e6], [0, 1.0, 1e6]]),
        bg_enabled=bg_enabled, bg_index=bg_index,
    )


@pytest.fixture(scope="module")
def masked_example():
    ex = make_example(0, seed=3)
    # synthetic person mask: center square around the bbox
    mask = np.zeros(ex.image.shape[:2], bool)
    x, y, w, h = ex.bbox.astype(int)
    mask[max(y, 0) : y + h, max(x, 0) : x + w] = True
    ex.mask = mask
    return ex


class TestHostPrep:
    def test_mask_tile_alignment(self, masked_example):
        prep = prepare_example(
            masked_example, H36M_17, 64, 128, aug=_aug(True),
            with_background=True,
        )
        assert prep["source_mask"].shape == (128, 128)
        assert prep["bg_params"][0] == 1.0 and prep["bg_params"][1] == 2.0
        # mask tile must mark fg where the source tile holds person pixels:
        # both were sliced with the SAME ROI, so their nonzero extents agree
        src_nonzero = prep["source"].any(-1)
        overlap = (prep["source_mask"] > 127) & src_nonzero
        assert overlap.sum() > 100

    def test_disabled_or_maskless_is_noop_mask(self, masked_example):
        prep = prepare_example(
            masked_example, H36M_17, 64, 128, aug=_aug(False),
            with_background=True,
        )
        assert np.all(prep["source_mask"] == 255)
        assert prep["bg_params"][0] == 0.0
        ex2 = make_example(1, seed=3)  # no mask attribute set
        prep2 = prepare_example(ex2, H36M_17, 64, 128, aug=_aug(True),
                                with_background=True)
        assert np.all(prep2["source_mask"] == 255)

    def test_without_flag_no_keys(self, masked_example):
        prep = prepare_example(masked_example, H36M_17, 64, 128, aug=_aug(True))
        assert "source_mask" not in prep and "bg_params" not in prep


class TestDeviceComposite:
    def test_replaces_background_keeps_foreground(self):
        src = np.full((2, 16, 16, 3), 40, np.uint8)
        mask = np.zeros((2, 16, 16), np.uint8)
        mask[:, :8] = 255  # top half is foreground
        bank = np.stack([
            np.full((16, 16, 3), 200, np.uint8),
            np.full((16, 16, 3), 90, np.uint8),
        ])
        params = np.array([[1.0, 1.0], [0.0, 0.0]], np.float32)  # on idx1; off
        out = np.asarray(composite_background(
            jnp.asarray(src), jnp.asarray(mask), jnp.asarray(bank),
            jnp.asarray(params)))
        assert np.all(out[0, :8] == 40)    # fg kept
        assert np.all(out[0, 8:] == 90)    # bg replaced with bank[1]
        assert np.all(out[1] == 40)        # disabled -> untouched

    def test_partial_alpha_blends(self):
        src = np.full((1, 4, 4, 3), 100, np.uint8)
        mask = np.full((1, 4, 4), 128, np.uint8)  # half fg
        bank = np.full((1, 4, 4, 3), 200, np.uint8)
        params = np.array([[1.0, 0.0]], np.float32)
        out = np.asarray(composite_background(
            jnp.asarray(src), jnp.asarray(mask), jnp.asarray(bank),
            jnp.asarray(params)))
        assert 145 <= out[0, 0, 0, 0] <= 155


class TestEndToEnd:
    def test_crop_background_changes_gt_invariant(self, masked_example):
        prep_on = prepare_one(masked_example, H36M_17, 64, 128, AugConfig(
            background_prob=1.0, occlude_prob=0.0, color_prob=0.0,
            flip_prob=0.0), (0, 0, 0), 4, 1.0, n_backgrounds=3)
        prep_off = dict(prep_on)
        prep_off["bg_params"] = np.zeros(2, np.float32)
        bank = np.stack([np.full((128, 128, 3), c, np.uint8) for c in (250, 10, 120)])

        batch_on = stack_examples([prep_on])
        batch_off = stack_examples([prep_off])
        crops_on = np.asarray(device_augment(
            batch_on, 64, train=True, background_bank=jnp.asarray(bank)))
        crops_off = np.asarray(device_augment(
            batch_off, 64, train=True, background_bank=jnp.asarray(bank)))
        # GT arrays identical (background is appearance-only)
        np.testing.assert_array_equal(
            batch_on["coords3d_true"], batch_off["coords3d_true"])
        if prep_on["bg_params"][0] > 0:  # bg draw fired (prob=1 -> always)
            assert np.abs(crops_on - crops_off).max() > 0.1
