"""ResNet-50 — stretch layer-zoo model (BASELINE config
"MobileNet-V2 / ResNet-50 @224 large-batch"). Bottleneck residual blocks
(1x1 reduce → 3x3 → 1x1 expand, pointwise-projected skips) from the same layer
zoo; MaxPool stem (the layer the reference shipped broken and unused,
layers/pooling.py:45-77 — completed here)."""

from dorknet_tpu.network import FeedForwardNetwork
from dorknet_tpu.layers import (
    ConvLayer, PointwiseConvLayer, DenseLayer, BatchNormLayer, ReLu,
    GlobalAveragePoolingLayer, MaxPoolLayer, ResidualBlock,
    SoftmaxWithCrossEntropy,
)
from dorknet_tpu.regularisers.l2 import l2


class ResNet50(FeedForwardNetwork):
    _STAGES = [  # (bottleneck width, out channels, blocks, first stride)
        (64, 256, 3, 1),
        (128, 512, 4, 2),
        (256, 1024, 6, 2),
        (512, 2048, 3, 2),
    ]

    def _bottleneck(self, name, in_ch, width, out_ch, stride, reg=0.0001):
        layer_list = [
            PointwiseConvLayer(name + "_reduce", filter_block_shape=(width, in_ch),
                               stride=stride, with_bias=False,
                               weight_regulariser=l2(reg)),
            BatchNormLayer(name + "_reduce_bn", incoming_chans=width),
            ReLu(name + "_reduce_relu"),
            ConvLayer(name + "_conv3", filter_block_shape=(width, width, 3, 3),
                      stride=1, padding=1, with_bias=False,
                      weight_regulariser=l2(reg)),
            BatchNormLayer(name + "_conv3_bn", incoming_chans=width),
            ReLu(name + "_conv3_relu"),
            PointwiseConvLayer(name + "_expand", filter_block_shape=(out_ch, width),
                               with_bias=False, weight_regulariser=l2(reg)),
            BatchNormLayer(name + "_expand_bn", incoming_chans=out_ch),
        ]
        if stride != 1 or in_ch != out_ch:
            skip = PointwiseConvLayer(name + "_skip",
                                      filter_block_shape=(out_ch, in_ch),
                                      stride=stride, with_bias=False,
                                      weight_regulariser=l2(reg))
        else:
            skip = None
        self.add_layer(ResidualBlock(name, layer_list=layer_list,
                                     skip_projection=skip,
                                     post_skip_activation=ReLu(name + "_relu")))

    def __init__(self, name, num_classes=1000, load_layers=True):
        super().__init__(name)
        if not load_layers:
            return
        # Stem: 7x7/s2 conv + 2x2/s2 max pool (vs canonical 3x3/s2 pool — the
        # zoo's MaxPoolLayer is square window == stride)
        self.add_layer(ConvLayer("stem", filter_block_shape=(64, 3, 7, 7),
                                 stride=2, padding=3, with_bias=False,
                                 weight_regulariser=l2(0.0001)))
        self.add_layer(BatchNormLayer("stem_bn", incoming_chans=64))
        self.add_layer(ReLu("stem_relu"))
        self.add_layer(MaxPoolLayer("stem_pool", None, stride=2))
        in_ch = 64
        for si, (width, out_ch, blocks, stride) in enumerate(self._STAGES):
            for b in range(blocks):
                self._bottleneck("s{}b{}".format(si + 1, b), in_ch, width,
                                 out_ch, stride if b == 0 else 1)
                in_ch = out_ch
        self.add_layer(GlobalAveragePoolingLayer("global_pool"))
        self.add_layer(DenseLayer("classifier", incoming_chans=2048,
                                  output_dim=num_classes,
                                  weight_regulariser=l2(0.0001)))
        self.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))


class ResNet101(ResNet50):
    """ResNet-101: the ResNet-50 builder with the canonical deeper stage-3
    (23 bottlenecks instead of 6 — He et al. table 1). Same stem, widths,
    skip projections, h5 schema."""

    _STAGES = [
        (64, 256, 3, 1),
        (128, 512, 4, 2),
        (256, 1024, 23, 2),
        (512, 2048, 3, 2),
    ]
