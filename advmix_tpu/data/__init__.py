from .datasets import COCODataset, MPIIDataset, SyntheticPoseDataset, build_dataset
from .loader import Loader

__all__ = [
    "COCODataset",
    "MPIIDataset",
    "SyntheticPoseDataset",
    "build_dataset",
    "Loader",
]
