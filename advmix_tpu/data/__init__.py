from .datasets import (COCODataset, MPIIDataset, SyntheticPoseDataset,
                       ConcatDataset, build_dataset, build_stylized_dataset)
from .loader import CachedLoader, Loader

__all__ = [
    "CachedLoader",
    "COCODataset",
    "MPIIDataset",
    "SyntheticPoseDataset",
    "build_dataset",
    "ConcatDataset",
    "build_stylized_dataset",
    "Loader",
]
