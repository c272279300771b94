"""Pure, jittable functional ops — the TPU compute core.

All 4-D activations use NHWC layout internally (TPU/MXU-friendly); weights are
stored in the reference's layouts (OIHW for conv, (C,fh,fw) for depthwise,
(O,C) for pointwise, (in,out) for dense) and re-laid-out at trace time.
"""

from dorknet_tpu.ops.conv import conv2d, depthwise_conv2d, pointwise_conv2d, dense
from dorknet_tpu.ops.norm import batch_norm_train, batch_norm_inference
from dorknet_tpu.ops.pool import max_pool, global_avg_pool
from dorknet_tpu.ops.loss import softmax_cross_entropy, softmax_probs

__all__ = [
    "conv2d",
    "depthwise_conv2d",
    "pointwise_conv2d",
    "dense",
    "batch_norm_train",
    "batch_norm_inference",
    "max_pool",
    "global_avg_pool",
    "softmax_cross_entropy",
    "softmax_probs",
]
