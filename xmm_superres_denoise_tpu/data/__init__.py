from .catalog import Catalog, build_catalog, match_file_list
from .datamodule import XmmDataModule
from .datasets import BoringDataset, XmmDataset, load_det_mask
from .splits import ensure_splits, expand_indices, load_splits_zip, random_split_indices

__all__ = [
    "BoringDataset", "Catalog", "XmmDataModule", "XmmDataset", "build_catalog",
    "ensure_splits", "expand_indices", "load_det_mask", "load_splits_zip",
    "match_file_list", "random_split_indices",
]
