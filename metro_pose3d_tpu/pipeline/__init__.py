"""Input pipeline: host prepares, device computes.

TPU-native redesign of the reference's L3+L4 (SURVEY.md §2): instead of
cv2-warping crops in host worker processes, the host only
  1. decodes JPEGs (CPU-bound, stays host-side),
  2. builds the virtual crop camera and its 3x3 warp parameters,
  3. slices a fixed-size uint8 source tile around the person,
  4. samples augmentation parameters (numpy RNG, deterministic per example),
and ships small arrays to the device, where ONE jit graph does homography
warp + occluder compositing + color jitter + normalization fused with the
model forward pass.
"""

from metro_pose3d_tpu.pipeline.crops import make_crop_camera, prepare_example
from metro_pose3d_tpu.pipeline.device import device_augment, EXAMPLE_SPEC
from metro_pose3d_tpu.pipeline.loader import batch_iterator, stack_examples

__all__ = [
    "make_crop_camera",
    "prepare_example",
    "device_augment",
    "EXAMPLE_SPEC",
    "batch_iterator",
    "stack_examples",
]
