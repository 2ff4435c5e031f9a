from .latent_dataset import ImgLatentDataset, LatentShardWriter
from .images import ImageFolderDataset, center_crop_arr, load_image
from .augment import train_augment, random_resized_crop_params

__all__ = [
    "ImgLatentDataset",
    "LatentShardWriter",
    "ImageFolderDataset",
    "center_crop_arr",
    "load_image",
    "train_augment",
    "random_resized_crop_params",
]
