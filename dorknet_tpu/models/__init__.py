from dorknet_tpu.models.mnist_convnet import MNISTNet
from dorknet_tpu.models.resnet import ResNet18

__all__ = ["MNISTNet", "ResNet18"]
