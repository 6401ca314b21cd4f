from eelunet_tpu.data.dataset import SegmentationFolderDataset, train_val_split
from eelunet_tpu.data.pipeline import DataLoader, prefetch_to_device

__all__ = ["SegmentationFolderDataset", "train_val_split", "DataLoader", "prefetch_to_device"]
