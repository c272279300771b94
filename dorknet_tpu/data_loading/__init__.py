from dorknet_tpu.data_loading.MNIST_data_loading import get_MNIST_data, epoch_image_generator
from dorknet_tpu.data_loading.image_data_loader import ImageDataLoader
from dorknet_tpu.data_loading.image_preprocessor import ImagePreprocessor
from dorknet_tpu.data_loading.image_augmentation import ImageAugmenter
from dorknet_tpu.data_loading.prefetch import device_prefetch, stack_batches
from dorknet_tpu.data_loading.device_dataset import (DeviceResidentDataset,
                                                     fits_in_hbm)

__all__ = [
    "get_MNIST_data",
    "epoch_image_generator",
    "ImageDataLoader",
    "ImagePreprocessor",
    "ImageAugmenter",
    "device_prefetch",
    "stack_batches",
    "DeviceResidentDataset",
    "fits_in_hbm",
]
