"""Dataset registry: `get_dataset(name)` (SURVEY.md §3 "Dataset registry").

Every dataset exposes the same protocol (duck-typed `PoseDataset`):
  joint_info    : JointInfo
  root_joint    : name of the root (pelvis) joint
  n_train/n_test: split sizes
  train_example(i) / test_example(i) -> pipeline.crops.Example

Real datasets parse annotations once and disk-cache the example index
(`utils.cache_result_on_disk`), loading images lazily per access.
"""
from __future__ import annotations

from typing import Protocol

from metro_pose3d_tpu.geom.joints import JointInfo
from metro_pose3d_tpu.pipeline.crops import Example


class PoseDataset(Protocol):
    joint_info: JointInfo
    root_joint: str
    n_train: int
    n_test: int

    def train_example(self, i: int) -> Example: ...

    def test_example(self, i: int) -> Example: ...


def get_dataset(name: str, data_root: str = "/data", **kwargs) -> PoseDataset:
    if name == "synthetic":
        from metro_pose3d_tpu.data.synthetic import SyntheticDataset

        return SyntheticDataset(**kwargs)
    if name == "h36m":
        from metro_pose3d_tpu.data.h36m import H36MDataset

        return H36MDataset(data_root, **kwargs)
    if name == "mpi_inf_3dhp":
        from metro_pose3d_tpu.data.mpi_inf_3dhp import Mpi3dhpDataset

        return Mpi3dhpDataset(data_root, **kwargs)
    if name == "mpii":
        from metro_pose3d_tpu.data.mpii import MpiiDataset

        return MpiiDataset(data_root, **kwargs)
    if name == "3dpw":
        from metro_pose3d_tpu.data.tdpw import Tdpw3Dataset

        return Tdpw3Dataset(data_root, **kwargs)
    raise KeyError(f"unknown dataset {name!r}")
