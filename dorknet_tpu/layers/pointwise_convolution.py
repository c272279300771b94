"""Pointwise (1x1) convolution layer.

Parity with the reference PointwiseConvLayer (layers/pointwise_convolution.py:6-129):
weights (num_filters, num_incoming_channels); stride>1 subsamples the input grid
BEFORE the 1x1 GEMM (reference :48-49, output spatial = ceil(H/s)); glorot limit
over (num_channels + num_filters); h5 schema identical (including the
stride-attr-absent fallback on load, reference :115-119)."""

import numpy as np
import jax.numpy as jnp

from dorknet_tpu.layers.registry import register_layer
from dorknet_tpu.layers.base import Layer, init_weights
from dorknet_tpu.ops.conv import pointwise_conv2d
from dorknet_tpu.utils import h5io


@register_layer
class PointwiseConvLayer(Layer):
    def __init__(self, layer_name, stride=1, filter_block_shape=None, with_bias=True,
                 weight_regulariser=None, weight_initialiser="normal"):
        """filter_block_shape = (num_filters, num_incoming_channels)"""
        super().__init__(layer_name)
        self.stride = stride
        self.with_bias = with_bias
        self.weight_regulariser = weight_regulariser
        self.weight_initialiser = weight_initialiser
        if filter_block_shape is not None:
            self.num_filters, self.num_channels = filter_block_shape
            weights = init_weights(filter_block_shape, weight_initialiser,
                                   self.num_channels, self.num_filters)
            self.learned_params = {"weights": weights}
            self.grads = {"weights": jnp.zeros_like(weights)}
            if with_bias:
                bias = jnp.zeros(self.num_filters, dtype=jnp.float32)
                self.learned_params["bias"] = bias
                self.grads["bias"] = jnp.zeros_like(bias)
        else:
            self.num_filters = None
            self.learned_params = {}
            self.grads = {}

    def __repr__(self):
        out = "PointwiseConvLayer({}, ".format(self.layer_name)
        if self.num_filters is not None:
            out += "filter_block_shape=({}, {}), ".format(self.num_filters,
                                                          self.num_channels)
        out += "stride={}, with_bias={}, weight_regulariser={}, is_on_gpu={})".format(
            self.stride, self.with_bias, repr(self.weight_regulariser), self.is_on_gpu)
        return out

    def fapply(self, params, state, x, train):
        b = params.get("bias") if self.with_bias else None
        return pointwise_conv2d(x, params["weights"], b, stride=self.stride), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(
            open_f, self.layer_name, "PointwiseConvLayer",
            with_bias=self.with_bias, num_filters=self.num_filters,
            num_channels=self.num_channels, stride=self.stride)
        h5io.save_param_datasets(open_f, self.layer_name, self.learned_params,
                                 self.grads, self.weight_regulariser,
                                 self.with_bias, save_grads=save_grads)

    def load_from_h5(self, open_f, load_grads=True):
        # loading can change trace-time statics (stride/padding/
        # eps/...) that are NOT part of the jit key — drop stale traces
        self._jit_cache = {}
        info = open_f[self.layer_name + "/layer_info"].attrs
        self.num_filters = int(info["num_filters"])
        self.num_channels = int(info["num_channels"])
        stride = info.get("stride", None)
        self.stride = int(stride) if stride else 1
        self.with_bias = bool(info["with_bias"])
        self.weight_regulariser = h5io.load_param_datasets(
            open_f, self.layer_name, self.learned_params, self.grads,
            self.with_bias, load_grads=load_grads)
