"""Data layer: ADM image pipeline + latent-feature datasets/batchers."""

from .features import FeatureDataset, feature_batches, synthetic_features
from .imagenet import ImageFolderIndex, center_crop_arr, load_image

__all__ = [
    "FeatureDataset",
    "feature_batches",
    "synthetic_features",
    "ImageFolderIndex",
    "center_crop_arr",
    "load_image",
]
