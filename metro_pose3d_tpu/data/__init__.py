"""Dataset registry and builders (SURVEY.md §2 L2).

`get_dataset(name)` returns a `PoseDataset` with joint metadata and indexable
example accessors for each split. Real datasets (H36M, MPI-INF-3DHP, MPII)
build from `$DATA_ROOT` with disk-cached example lists, mirroring the
reference's `src/data/` builders; the synthetic dataset is self-contained and
backs tests and benchmarks.
"""

from metro_pose3d_tpu.data.datasets import PoseDataset, get_dataset

__all__ = ["PoseDataset", "get_dataset"]
