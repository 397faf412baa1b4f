"""On-device ops: decode, warp, augmentation — all pure JAX / Pallas.

These are the TPU-native replacements for the reference's `src/tfu.py` /
`src/tfu3d.py` TF ops and its OpenCV host-side warping (SURVEY.md §3).
Everything here is jittable, differentiable where relevant, and shape-static.
"""

from metro_pose3d_tpu.ops.soft_argmax import soft_argmax_2d, soft_argmax_3d
from metro_pose3d_tpu.ops.decode import (
    heatmap_to_metric,
    heatmap_to_image,
    root_relative,
)
from metro_pose3d_tpu.ops.pose3d import (
    reconstruct_absolute,
    rescale_to_bone_lengths,
    mean_bone_lengths,
)
from metro_pose3d_tpu.ops.tta import flip_crop, unflip_pose3d, unflip_pose2d

__all__ = [
    "soft_argmax_2d",
    "soft_argmax_3d",
    "heatmap_to_metric",
    "heatmap_to_image",
    "root_relative",
    "reconstruct_absolute",
    "rescale_to_bone_lengths",
    "mean_bone_lengths",
    "flip_crop",
    "unflip_pose3d",
    "unflip_pose2d",
]
