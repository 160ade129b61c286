from .datasets import (COCODataset, MPIIDataset, SyntheticPoseDataset,
                       ConcatDataset, build_dataset, build_stylized_dataset)
from .loader import Loader

__all__ = [
    "COCODataset",
    "MPIIDataset",
    "SyntheticPoseDataset",
    "build_dataset",
    "ConcatDataset",
    "build_stylized_dataset",
    "Loader",
]
