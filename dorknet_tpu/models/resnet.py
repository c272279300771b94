"""ResNet builders.

``ResNet18`` reproduces the reference flagship exactly
(examples/imagenet_dogs_225_resnet_18_depsep.py:32-160): a 5x5/s2 stem conv +
strided pointwise, eight depthwise-separable residual blocks (64→512, downsample
at blocks 3/5/7 via stride-2 depthwise + pointwise skip projection), GAP and a
Dense classifier. Layer names match the reference so its released checkpoints
load directly (res1..res8, conv0, pw0, dense1, softmax1).

``build_resnet18_plain`` provides the non-depthwise variant the reference's
``add_res_block(depthwise_sep=False)`` path constructs.
"""

from dorknet_tpu.network import FeedForwardNetwork
from dorknet_tpu.layers import (
    ConvLayer, DepthwiseConvLayer, PointwiseConvLayer, DenseLayer,
    BatchNormLayer, ReLu, GlobalAveragePoolingLayer, ResidualBlock,
    SoftmaxWithCrossEntropy,
)
from dorknet_tpu.regularisers.l2 import l2


class ResNet18(FeedForwardNetwork):
    def depthwise_sep_layer(self, layer_name, incoming_chans, filter_block_shape,
                            stride=1, padding=1, with_bias=False,
                            batch_norm_depthwise=True, relu_depthwise=False,
                            batch_norm_pointwise=True,
                            depthwise_weight_regulariser=None,
                            pointwise_weight_regulariser=None,
                            final_relu=True, add_layers=False):
        """filter_block_shape: (outgoing_chans, incoming_chans, f_rows, f_cols)"""
        depthwise_filter_shape = (incoming_chans, filter_block_shape[-2],
                                  filter_block_shape[-1])
        pointwise_filter_shape = (filter_block_shape[0], incoming_chans)
        layer_list = [DepthwiseConvLayer(layer_name + "_dw",
                                         filter_block_shape=depthwise_filter_shape,
                                         stride=stride, padding=padding,
                                         with_bias=with_bias,
                                         weight_regulariser=depthwise_weight_regulariser)]
        if batch_norm_depthwise:
            layer_list.append(BatchNormLayer(layer_name + "_dw_bn",
                                             input_dimension=4,
                                             incoming_chans=incoming_chans))
        if relu_depthwise:
            layer_list.append(ReLu(layer_name + "dw_relu"))
        layer_list.append(PointwiseConvLayer(layer_name + "_pw",
                                             filter_block_shape=pointwise_filter_shape,
                                             with_bias=with_bias,
                                             weight_regulariser=pointwise_weight_regulariser))
        if batch_norm_pointwise:
            layer_list.append(BatchNormLayer(layer_name + "_pw_bn",
                                             input_dimension=4,
                                             incoming_chans=filter_block_shape[0]))
        if final_relu:
            layer_list.append(ReLu(layer_name + "pw_relu"))
        if add_layers:
            for layer in layer_list:
                self.add_layer(layer)
        else:
            return layer_list

    def add_res_block(self, layer_name, first_filter_block_shape, downsample=False,
                      weight_regulariser_strength=0.0001, depthwise_sep=False):
        num_filters, incoming_chans, f_rows, f_cols = first_filter_block_shape
        layer_list = []
        if depthwise_sep:
            layer_list += self.depthwise_sep_layer(
                layer_name + "_dw1", incoming_chans, first_filter_block_shape,
                stride=2 if downsample else 1, padding=1,
                depthwise_weight_regulariser=None,
                pointwise_weight_regulariser=l2(strength=weight_regulariser_strength),
                final_relu=True, add_layers=False)
            layer_list += self.depthwise_sep_layer(
                layer_name + "_dw2", num_filters,
                (num_filters, num_filters, f_rows, f_cols), stride=1, padding=1,
                depthwise_weight_regulariser=None,
                pointwise_weight_regulariser=l2(strength=weight_regulariser_strength),
                final_relu=False, add_layers=False)
        else:
            layer_list.append(ConvLayer(
                layer_name + "_conv1", filter_block_shape=first_filter_block_shape,
                stride=2 if downsample else 1, padding=1, with_bias=False,
                weight_regulariser=l2(strength=weight_regulariser_strength)))
            layer_list.append(BatchNormLayer(layer_name + "_bn1", input_dimension=4,
                                             incoming_chans=num_filters))
            layer_list.append(ReLu(layer_name + "_relu1"))
            layer_list.append(ConvLayer(
                layer_name + "_conv2",
                filter_block_shape=(num_filters, num_filters, f_rows, f_cols),
                stride=1, padding=1, with_bias=False,
                weight_regulariser=l2(strength=weight_regulariser_strength)))
            layer_list.append(BatchNormLayer(layer_name + "_bn2", input_dimension=4,
                                             incoming_chans=num_filters))
        if downsample:
            skip_proj = PointwiseConvLayer(
                layer_name + "_pw_skip", filter_block_shape=(num_filters, incoming_chans),
                stride=2, with_bias=False,
                weight_regulariser=l2(strength=weight_regulariser_strength))
        else:
            skip_proj = None
        self.add_layer(ResidualBlock(layer_name, layer_list=layer_list,
                                     skip_projection=skip_proj,
                                     post_skip_activation=ReLu(layer_name + "_relu2")))

    # residual stage table: (out_channels, in_channels, downsample)
    # spatial: 225 →(stem/2)→ 112 →(pw0/2)→ 56 → 56 → 28 → 28 → 14 → 14 → 7 → 7
    _BLOCKS = [
        (64, 64, False), (64, 64, False),
        (128, 64, True), (128, 128, False),
        (256, 128, True), (256, 256, False),
        (512, 256, True), (512, 512, False),
    ]

    def __init__(self, name, load_layers=True, num_classes=120, depthwise_sep=True):
        super().__init__(name)
        if not load_layers:
            return
        reg = l2(0.0001)
        self.add_layer(ConvLayer("conv0", filter_block_shape=(64, 3, 5, 5),
                                 with_bias=False, stride=2, padding=1,
                                 weight_regulariser=reg))
        self.add_layer(BatchNormLayer("conv0_bn", input_dimension=4,
                                      incoming_chans=64))
        self.add_layer(ReLu("conv0_relu"))
        self.add_layer(PointwiseConvLayer("pw0", filter_block_shape=(64, 64),
                                          with_bias=False, stride=2,
                                          weight_regulariser=l2(0.0001)))
        self.add_layer(BatchNormLayer("pw0_bn", input_dimension=4,
                                      incoming_chans=64))
        self.add_layer(ReLu("pw0_relu"))
        for i, (out_ch, in_ch, down) in enumerate(self._BLOCKS, start=1):
            self.add_res_block("res{}".format(i), (out_ch, in_ch, 3, 3),
                               downsample=down, depthwise_sep=depthwise_sep)
        self.add_layer(GlobalAveragePoolingLayer("global_pool1"))
        self.add_layer(DenseLayer("dense1", incoming_chans=512,
                                  output_dim=num_classes,
                                  weight_regulariser=l2(0.0001)))
        self.set_loss_layer(SoftmaxWithCrossEntropy("softmax1"))


def build_resnet18_plain(name, num_classes=120):
    """Non-depthwise-separable ResNet-18 variant (the reference's
    add_res_block(depthwise_sep=False) path)."""
    return ResNet18(name, load_layers=True, num_classes=num_classes,
                    depthwise_sep=False)
