"""EfficientNet-Lite — stretch layer-zoo model family.

EfficientNet-B0's MBConv trunk with the three "lite" modifications (the
TPU/edge-friendly variant): squeeze-excite removed, swish replaced by ReLU6,
and stem/head channels (plus the first/last stage's repeat counts) exempt
from compound scaling. Built entirely from this framework's layer zoo —
MBConv blocks are ResidualBlocks of expand-pointwise -> BN -> ReLU6 ->
depthwise(k, s) -> BN -> ReLU6 -> project-pointwise -> BN with an identity
skip when stride==1 and channels match (the same linear-bottleneck shape as
models/mobilenet_v2.py, plus 5x5 depthwise stages).

Not present in the reference (its zoo stops at the depthwise-separable
ResNet-18, examples/imagenet_dogs_225_resnet_18_depsep.py); included as a
stretch-zoo family alongside MobileNet-V2/V3 and ResNet-50."""

import math

from dorknet_tpu.network import FeedForwardNetwork
from dorknet_tpu.layers import (
    ConvLayer, PointwiseConvLayer, DenseLayer, BatchNormLayer, ReLu6,
    GlobalAveragePoolingLayer, SoftmaxWithCrossEntropy,
)
from dorknet_tpu.regularisers.l2 import l2

from dorknet_tpu.models.mobilenet_v2 import (_make_divisible,
                                             add_inverted_residual)


class EfficientNetLite(FeedForwardNetwork):
    # (kernel k, expansion t, out channels c, repeats n, first stride s) —
    # the B0 trunk
    _CFG = [
        (3, 1, 16, 1, 1),
        (3, 6, 24, 2, 2),
        (5, 6, 40, 2, 2),
        (3, 6, 80, 3, 2),
        (5, 6, 112, 3, 1),
        (5, 6, 192, 4, 2),
        (3, 6, 320, 1, 1),
    ]

    def _mbconv(self, name, in_ch, out_ch, kernel, stride, expansion,
                reg=0.0001):
        add_inverted_residual(self, name, in_ch, out_ch, stride, expansion,
                              kernel=kernel, reg=reg)

    def __init__(self, name, num_classes=1000, width_mult=1.0,
                 depth_mult=1.0, load_layers=True):
        """lite0 = (1.0, 1.0); lite1 (1.0, 1.1); lite2 (1.1, 1.2);
        lite3 (1.2, 1.4); lite4 (1.4, 1.8)."""
        super().__init__(name)
        if not load_layers:
            return
        # lite rule: stem/head channels are NOT width-scaled
        in_ch = 32
        self.add_layer(ConvLayer("stem", filter_block_shape=(in_ch, 3, 3, 3),
                                 stride=2, padding=1, with_bias=False,
                                 weight_regulariser=l2(0.0001)))
        self.add_layer(BatchNormLayer("stem_bn", incoming_chans=in_ch))
        self.add_layer(ReLu6("stem_relu6"))
        block = 0
        n_stages = len(self._CFG)
        for stage, (k, t, c, n, s) in enumerate(self._CFG):
            out_ch = _make_divisible(c * width_mult)
            # lite rule: first and last stage repeats are NOT depth-scaled
            reps = (n if stage in (0, n_stages - 1)
                    else int(math.ceil(n * depth_mult)))
            for i in range(reps):
                self._mbconv("mb{}".format(block), in_ch, out_ch, k,
                             s if i == 0 else 1, t)
                in_ch = out_ch
                block += 1
        last = 1280  # lite rule: head channels fixed
        self.add_layer(PointwiseConvLayer("head",
                                          filter_block_shape=(last, in_ch),
                                          with_bias=False,
                                          weight_regulariser=l2(0.0001)))
        self.add_layer(BatchNormLayer("head_bn", incoming_chans=last))
        self.add_layer(ReLu6("head_relu6"))
        self.add_layer(GlobalAveragePoolingLayer("global_pool"))
        self.add_layer(DenseLayer("classifier", incoming_chans=last,
                                  output_dim=num_classes,
                                  weight_regulariser=l2(0.0001)))
        self.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))


def EfficientNetLite0(name, num_classes=1000, load_layers=True):
    return EfficientNetLite(name, num_classes=num_classes, width_mult=1.0,
                            depth_mult=1.0, load_layers=load_layers)
