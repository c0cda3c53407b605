"""Data subsystem: dataset readers + vectorized batch pipeline."""

from .datasets import DATASET_SIZE, ArrayDataset, synthetic  # noqa: F401
from .pipeline import DatasetLoaders, Loader, read_dataset  # noqa: F401
