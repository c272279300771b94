"""Depthwise convolution layer.

Parity with the reference DepthwiseConvLayer (layers/depthwise_convolution.py:10-353):
weights (num_incoming_channels, f_rows, f_cols), glorot limit sqrt(6/(2*C))
(reference :25-27), stride/padding/bias semantics and h5 schema identical. The
reference's direct per-(batch,channel) loops (Cython, layers/im2col.pyx:109-178;
CUDA, layers/depthwise_convolution.py:104-140) become one grouped XLA conv with
``feature_group_count=C`` on the MXU."""

import numpy as np
import jax.numpy as jnp

from dorknet_tpu.layers.registry import register_layer
from dorknet_tpu.layers.base import Layer, init_weights
from dorknet_tpu.ops.conv import depthwise_conv2d
from dorknet_tpu.utils import h5io


@register_layer
class DepthwiseConvLayer(Layer):
    def __init__(self, layer_name, filter_block_shape=None,
                 stride=1, padding=1, with_bias=True,
                 weight_regulariser=None, weight_initialiser="normal"):
        """filter_block_shape = (num_incoming_channels, num_filter_rows, num_filter_cols)"""
        super().__init__(layer_name)
        self.stride = stride
        self.padding = padding
        self.with_bias = with_bias
        self.weight_regulariser = weight_regulariser
        self.weight_initialiser = weight_initialiser
        if filter_block_shape is not None:
            self.num_filters, self.f_rows, self.f_cols = filter_block_shape
            weights = init_weights(filter_block_shape, weight_initialiser,
                                   self.num_filters, self.num_filters)
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
        out = "DepthwiseConvLayer({}, ".format(self.layer_name)
        if self.num_filters is not None:
            out += "filter_block_shape=({}, {}, {}), ".format(
                self.num_filters, self.f_rows, self.f_cols)
        out += "stride={}, padding={}, with_bias={}, weight_regulariser={})".format(
            self.stride, self.padding, self.with_bias, repr(self.weight_regulariser))
        return out

    def fapply(self, params, state, x, train):
        b = params.get("bias") if self.with_bias else None
        return depthwise_conv2d(x, params["weights"], b,
                                stride=self.stride, padding=self.padding), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(
            open_f, self.layer_name, "DepthwiseConvLayer",
            with_bias=self.with_bias, num_filters=self.num_filters,
            f_rows=self.f_rows, f_cols=self.f_cols,
            stride=self.stride, padding=self.padding)
        h5io.save_param_datasets(open_f, self.layer_name, self.learned_params,
                                 self.grads, self.weight_regulariser,
                                 self.with_bias, save_grads=save_grads)

    def load_from_h5(self, open_f, load_grads=True):
        # loading can change trace-time statics (stride/padding/
        # eps/...) that are NOT part of the jit key — drop stale traces
        self._jit_cache = {}
        info = open_f[self.layer_name + "/layer_info"].attrs
        self.num_filters = int(info["num_filters"])
        self.with_bias = bool(info["with_bias"])
        self.f_rows = int(info["f_rows"])
        self.f_cols = int(info["f_cols"])
        self.stride = int(info["stride"])
        self.padding = int(info["padding"])
        self.weight_regulariser = h5io.load_param_datasets(
            open_f, self.layer_name, self.learned_params, self.grads,
            self.with_bias, load_grads=load_grads)
