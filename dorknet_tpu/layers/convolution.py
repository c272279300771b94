"""Standard convolution layer.

API/behaviour parity with the reference ConvLayer (layers/convolution.py:12-281):
weights in (num_filters, filter_chans, f_rows, f_cols) layout, glorot_uniform /
0.01*randn init over the channel fans, optional bias, zero padding, square stride,
h5 schema identical. The compute maps to the MXU via ``ops.conv2d``
(XLA's conv == the reference's im2col+GEMM, layers/convolution.py:58-87, done in
one fused kernel)."""

import numpy as np
import jax.numpy as jnp

from dorknet_tpu.layers.registry import register_layer
from dorknet_tpu.layers.base import Layer, init_weights
from dorknet_tpu.ops.conv import conv2d
from dorknet_tpu.utils import h5io


@register_layer
class ConvLayer(Layer):
    def __init__(self, layer_name, filter_block_shape=None, stride=1, padding=1,
                 with_bias=True, weight_regulariser=None, weight_initialiser="normal"):
        super().__init__(layer_name)
        self.stride = stride
        self.padding = padding
        self.weight_regulariser = weight_regulariser
        self.weight_initialiser = weight_initialiser
        if filter_block_shape:
            (self.num_filters, self.filter_chans,
             self.f_rows, self.f_cols) = filter_block_shape
            weights = init_weights(filter_block_shape, weight_initialiser,
                                   self.filter_chans, self.num_filters)
            self.learned_params = {"weights": weights}
            self.grads = {"weights": jnp.zeros_like(weights)}
            self.with_bias = with_bias
            if with_bias:
                bias = jnp.zeros(self.num_filters, dtype=jnp.float32)
                self.learned_params["bias"] = bias
                self.grads["bias"] = jnp.zeros_like(bias)
        else:
            self.num_filters = None
            self.with_bias = with_bias
            self.learned_params = {}
            self.grads = {}

    def __repr__(self):
        out = "ConvLayer({}, ".format(self.layer_name)
        if self.num_filters is not None:
            # NB the reference prints f_rows twice (layers/convolution.py:41-45);
            # kept verbatim so structure-json files are byte-compatible.
            out += "filter_block_shape=({},{},{},{}), ".format(
                self.num_filters, self.filter_chans, self.f_rows, self.f_rows)
        out += "stride={}, padding={}, with_bias={}, weight_regulariser={})".format(
            self.stride, self.padding, self.with_bias, self.weight_regulariser)
        return out

    def fapply(self, params, state, x, train):
        b = params.get("bias") if self.with_bias else None
        return conv2d(x, params["weights"], b,
                      stride=self.stride, padding=self.padding), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(
            open_f, self.layer_name, "ConvLayer",
            with_bias=self.with_bias, num_filters=self.num_filters,
            filter_chans=self.filter_chans, f_rows=self.f_rows,
            f_cols=self.f_cols, stride=self.stride, padding=self.padding)
        h5io.save_param_datasets(open_f, self.layer_name, self.learned_params,
                                 self.grads, self.weight_regulariser,
                                 self.with_bias, save_grads=save_grads)

    def load_from_h5(self, open_f, load_grads=True):
        # loading can change trace-time statics (stride/padding/
        # eps/...) that are NOT part of the jit key — drop stale traces
        self._jit_cache = {}
        info = open_f[self.layer_name + "/layer_info"].attrs
        self.num_filters = int(info["num_filters"])
        self.filter_chans = int(info["filter_chans"])
        self.with_bias = bool(info["with_bias"])
        self.f_rows = int(info["f_rows"])
        self.f_cols = int(info["f_cols"])
        self.stride = int(info["stride"])
        self.padding = int(info["padding"])
        self.weight_regulariser = h5io.load_param_datasets(
            open_f, self.layer_name, self.learned_params, self.grads,
            self.with_bias, load_grads=load_grads)
