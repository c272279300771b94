from dorknet_tpu.data_loading.MNIST_data_loading import get_MNIST_data, epoch_image_generator

__all__ = ["get_MNIST_data", "epoch_image_generator"]
