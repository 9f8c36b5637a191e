from .dataset import SoundDataset, get_dataloader, collate_one_or_multiple_tensors

__all__ = ["SoundDataset", "get_dataloader", "collate_one_or_multiple_tensors"]
