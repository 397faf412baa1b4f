"""Core geometry: camera model, boxes, joint metadata, rigid alignment.

Host-side (numpy, float64) — mirrors the responsibilities of the reference's
`src/cameralib.py`, `src/boxlib.py`, `src/data/joint_info.py` (SURVEY.md §2 L1),
but emits warp parameters consumed by the on-device JAX/Pallas kernels instead
of calling OpenCV.
"""

from metro_pose3d_tpu.geom.camera import Camera, reproject_image_points, get_warp_params
from metro_pose3d_tpu.geom import boxes
from metro_pose3d_tpu.geom.joints import JointInfo, get_joint_info
from metro_pose3d_tpu.geom.procrustes import procrustes_align

__all__ = [
    "Camera",
    "reproject_image_points",
    "get_warp_params",
    "boxes",
    "JointInfo",
    "get_joint_info",
    "procrustes_align",
]
