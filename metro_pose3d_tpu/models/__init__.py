"""Model family: ResNet backbones + MeTRo / 2.5D-baseline heads (Flax linen).

TPU-native counterpart of the reference's `src/model/metro.py`,
`src/model/twofive.py` and its vendored slim ResNet (SURVEY.md §3):
bfloat16 compute on the MXU, float32 params/statistics, stride-16 via a
dilated final stage, heads fused into the backbone graph.
"""

from metro_pose3d_tpu.models.resnet import ResNet, RESNET_DEPTHS
from metro_pose3d_tpu.models.metro import MetroModel, decode_metro, decode_twofive
from metro_pose3d_tpu.models.losses import compute_losses

__all__ = [
    "ResNet",
    "RESNET_DEPTHS",
    "MetroModel",
    "decode_metro",
    "decode_twofive",
    "compute_losses",
]
