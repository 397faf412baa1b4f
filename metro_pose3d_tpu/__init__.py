"""metro_pose3d_tpu — a TPU-native rebuild of the MeTRo 3D human pose estimator.

This is a from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference repo `isarandi/metro-pose3d` (TF1 research code; see SURVEY.md for the
full structural analysis). It is NOT a port: the compute path is a single jit
graph (on-device crop warp + augmentation -> ResNet-50 stride-16-dilated ->
metric-scale volumetric heatmaps -> 3D soft-argmax -> flip-TTA -> absolute
back-projection), data-parallel over an ICI mesh via jax.sharding.

Subpackages
-----------
geom      : camera model, boxes, joint metadata, Procrustes (host + JAX)
ops       : soft-argmax decode, homography warp (XLA + Pallas), color aug,
            absolute reconstruction, flip-TTA, bone-length rescale
models    : Flax ResNet backbone + MeTRo / 2.5D-baseline heads + losses
pipeline  : host-side example loading feeding the on-device crop pipeline
parallel  : mesh construction and sharding helpers
train     : optax/pjit training loop, orbax checkpointing
evaluation: prediction dump + H36M / 3DHP protocol metrics
data      : dataset registry and builders (H36M, MPI-INF-3DHP, MPII, synthetic)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package import time).

    >>> import metro_pose3d_tpu as mp
    >>> est = mp.MultiPersonEstimator(cfg, variables, joint_info)
    """
    lazy = {
        "Config": ("metro_pose3d_tpu.config", "Config"),
        "apply_overrides": ("metro_pose3d_tpu.config", "apply_overrides"),
        "PoseEstimator": ("metro_pose3d_tpu.evaluation.engine", "PoseEstimator"),
        "MultiPersonEstimator": ("metro_pose3d_tpu.multiperson", "MultiPersonEstimator"),
        "get_dataset": ("metro_pose3d_tpu.data", "get_dataset"),
        "get_joint_info": ("metro_pose3d_tpu.geom.joints", "get_joint_info"),
        "load_exported": ("metro_pose3d_tpu.export", "load_exported"),
        "export_model": ("metro_pose3d_tpu.export", "export_model"),
        "train": ("metro_pose3d_tpu.train.trainer", "train"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'metro_pose3d_tpu' has no attribute {name!r}")
