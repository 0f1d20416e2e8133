from nkbx.data.datasets import (
    AnnotatedSingletaskDataset,
    AnnotatedMultitaskDataset,
    AnnotatedYOLODataset,
    GroupsDataset,
    ImageFolderDataset,
    InferDataset,
    imread_rgb,
)
from nkbx.data.sampler import (
    ImbalancedDatasetSampler,
    SequentialSampler,
    ShuffleSampler,
)
from nkbx.data.loader import DataLoader, get_dataset, get_inference_dataset

__all__ = [
    "AnnotatedSingletaskDataset",
    "AnnotatedMultitaskDataset",
    "AnnotatedYOLODataset",
    "GroupsDataset",
    "ImageFolderDataset",
    "InferDataset",
    "imread_rgb",
    "ImbalancedDatasetSampler",
    "SequentialSampler",
    "ShuffleSampler",
    "DataLoader",
    "get_dataset",
    "get_inference_dataset",
]
