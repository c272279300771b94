from dorknet_tpu.layers.base import Layer
from dorknet_tpu.layers.convolution import ConvLayer
from dorknet_tpu.layers.depthwise_convolution import DepthwiseConvLayer
from dorknet_tpu.layers.pointwise_convolution import PointwiseConvLayer
from dorknet_tpu.layers.dense_layer import DenseLayer
from dorknet_tpu.layers.batch_norm import BatchNormLayer
from dorknet_tpu.layers.activations import (ReLu, ReLu6, IdentityLayer,
                                            HardSwish, HardSigmoid)
from dorknet_tpu.layers.squeeze_excite import SqueezeExciteLayer
from dorknet_tpu.layers.pooling import GlobalAveragePoolingLayer, MaxPoolLayer
from dorknet_tpu.layers.residual_block import ResidualBlock
from dorknet_tpu.layers.reshape import ReshapeLayer
from dorknet_tpu.layers.losses import SoftmaxWithCrossEntropy

__all__ = [
    "Layer",
    "ConvLayer",
    "DepthwiseConvLayer",
    "PointwiseConvLayer",
    "DenseLayer",
    "BatchNormLayer",
    "ReLu",
    "ReLu6",
    "IdentityLayer",
    "HardSwish",
    "HardSigmoid",
    "SqueezeExciteLayer",
    "GlobalAveragePoolingLayer",
    "MaxPoolLayer",
    "ResidualBlock",
    "ReshapeLayer",
    "SoftmaxWithCrossEntropy",
]
