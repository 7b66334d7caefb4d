"""Data layer: host-side image loading, resolution buckets, synthetic batches."""

from .base_dataset import BaseDataset
from .combinators import CatDataset, EasyDataset, MulDataset, ResizedDataset
from .loader import (
    DataLoader,
    collate_views,
    get_test_data_loader,
    get_train_data_loader,
)
from .samplers import (
    BatchedMultiFeatureRandomSampler,
    BatchedRandomSampler,
    DynamicBatchedMultiFeatureRandomSampler,
)
from .wai_datasets import WAI_DATASET_SPECS, WAIDataset, make_wai_dataset
