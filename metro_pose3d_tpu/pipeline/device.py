"""The on-device half of the input pipeline: one jittable augment function.

Fuses (XLA): homography+distortion warp -> occluder compositing -> color
jitter -> normalization, uint8 tiles in, model-ready crops out. This replaces
the reference's host-side cv2/occluder/color code (SURVEY.md §3.1 steps 3-5)
and runs sharded over the data mesh together with the train/eval step.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from metro_pose3d_tpu.ops.color import color_jitter, composite_background, normalize
from metro_pose3d_tpu.ops.occlusion import occlude_with_tiles
from metro_pose3d_tpu.ops.warp import warp_images


def example_spec(joint_count: int, tile_side: int, proc_side: int):
    """Shape/dtype spec of one prepared example (host -> device contract).

    Optional keys (present when background replacement is active, i.e. the
    loader was built with a background bank): "source_mask" (tile_side,
    tile_side) uint8 and "bg_params" (2,) float32.
    """
    j = joint_count
    return {
        "source": ((tile_side, tile_side, 3), np.uint8),
        "warp_h": ((3, 3), np.float32),
        "warp_k": ((4,), np.float32),
        "warp_dist": ((5,), np.float32),
        "coords3d_true": ((j, 3), np.float32),
        "coords2d_true": ((j, 2), np.float32),
        "joint_validity": ((j,), np.float32),
        "joint_validity_2d": ((j,), np.float32),
        "is_3d": ((), np.float32),
        "intrinsics": ((3, 3), np.float32),
        "color_params": ((4,), np.float32),
        "occ_params": ((2,), np.float32),
        "occ_affine": ((2, 3), np.float32),
    }


EXAMPLE_SPEC = example_spec  # alias (imported by pipeline/__init__)


def use_twopass_occluders(warp_sampler: str, proc_side: int) -> bool:
    """Static (trace-time) choice of the occluder compositing path — must
    agree between `pack_occluder_bank_for` and `device_augment`."""
    from metro_pose3d_tpu.ops.warp import _on_tpu

    return warp_sampler == "twopass" or (
        warp_sampler == "auto" and proc_side % 128 == 0 and _on_tpu()
    )


def pack_occluder_bank_for(warp_sampler: str, proc_side: int, bank_rgba01):
    """Pack the float RGBA occluder bank ONCE, outside the step graph, into
    the format `device_augment(..., occluder_packed=True)` consumes for the
    statically-chosen sampler (VERDICT r2 weak #7: previously the raw bank
    was re-packed inside every train step)."""
    if use_twopass_occluders(warp_sampler, proc_side):
        from metro_pose3d_tpu.ops.occlusion import pack_occluder_bank_raw

        return pack_occluder_bank_raw(bank_rgba01)
    from metro_pose3d_tpu.ops.occlusion import pack_occluder_bank

    return pack_occluder_bank(bank_rgba01)


def device_augment(batch: dict, proc_side: int, occluder_bank=None,
                   train: bool = True, background_bank=None,
                   warp_sampler: str = "auto", warp_newton_iters: int = 3,
                   occluder_packed: bool = False,
                   occluder_tile_side: int | None = None):
    """[B,T,T,3] uint8 tiles + params -> [B,S,S,3] normalized float crops.

    `occluder_bank`: [N, T2, T2, 4] float32 RGBA in [0,1] (device-resident);
    per-example indices select tiles with a gather so the graph stays static.
    With `occluder_packed=True` the bank is instead the pre-packed output of
    `pack_occluder_bank_for` (pack once at setup, not in-graph every step);
    `occluder_tile_side` must then give the original tile side.
    `background_bank`: [N, T, T, 3] uint8 (device-resident) for 3DHP
    green-screen replacement; used when the batch carries "source_mask".
    """
    source = batch["source"]
    if train and background_bank is not None and "source_mask" in batch:
        source = composite_background(
            source, batch["source_mask"], background_bank, batch["bg_params"]
        )
    crops = warp_images(
        source, batch["warp_h"], batch["warp_k"], batch["warp_dist"], proc_side,
        sampler=warp_sampler, newton_iters=warp_newton_iters,
    )
    crops = crops * (1.0 / 255.0)

    if train and occluder_bank is not None:
        idx = batch["occ_params"][:, 1].astype(jnp.int32)
        if use_twopass_occluders(warp_sampler, proc_side):
            from metro_pose3d_tpu.ops.occlusion import (
                occlude_with_bank_twopass, pack_occluder_bank_raw,
            )

            planes = (occluder_bank if occluder_packed
                      else pack_occluder_bank_raw(occluder_bank))
            crops = occlude_with_bank_twopass(
                crops, planes, idx,
                batch["occ_affine"], batch["occ_params"][:, 0],
            )
        else:
            from metro_pose3d_tpu.ops.occlusion import (
                occlude_with_bank, pack_occluder_bank,
            )

            if occluder_packed:
                table, t2 = occluder_bank, occluder_tile_side
                assert t2 is not None, (
                    "occluder_packed=True needs occluder_tile_side")
            else:
                table, t2 = pack_occluder_bank(occluder_bank), occluder_bank.shape[1]
            crops = occlude_with_bank(
                crops, table, t2, idx,
                batch["occ_affine"], batch["occ_params"][:, 0],
            )

    if train:
        cp = batch["color_params"]
        crops = color_jitter(crops, cp[:, 0], cp[:, 1], cp[:, 2], cp[:, 3])

    return normalize(crops)
