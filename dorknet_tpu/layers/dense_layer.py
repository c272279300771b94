"""Dense (fully-connected) layer.

Parity with the reference DenseLayer (layers/dense_layer.py:6-117): weights
(incoming_chans, output_dim), X @ W + b forward, glorot over (in+out), h5 schema
identical."""

import numpy as np
import jax.numpy as jnp

from dorknet_tpu.layers.registry import register_layer
from dorknet_tpu.layers.base import Layer, init_weights
from dorknet_tpu.ops.conv import dense
from dorknet_tpu.utils import h5io


@register_layer
class DenseLayer(Layer):
    def __init__(self, layer_name, incoming_chans=None, output_dim=None, with_bias=True,
                 weight_regulariser=None, weight_initialiser="normal"):
        super().__init__(layer_name)
        self.incoming_chans = incoming_chans
        self.output_dim = output_dim
        self.with_bias = with_bias
        self.weight_regulariser = weight_regulariser
        self.weight_initialiser = weight_initialiser

        if incoming_chans is not None and output_dim is not None:
            weights = init_weights((incoming_chans, output_dim), weight_initialiser,
                                   incoming_chans, output_dim)
            self.learned_params = {"weights": weights}
            self.grads = {"weights": jnp.zeros_like(weights)}
            if with_bias:
                bias = jnp.zeros(output_dim, dtype=jnp.float32)
                self.learned_params["bias"] = bias
                self.grads["bias"] = jnp.zeros_like(bias)
        else:
            self.learned_params = {}
            self.grads = {}

    def __repr__(self):
        return "DenseLayer({}, incoming_chans={}, output_dim={}, weight_regulariser={})".format(
            self.layer_name, self.incoming_chans, self.output_dim,
            repr(self.weight_regulariser))

    def fapply(self, params, state, x, train):
        b = params.get("bias") if self.with_bias else None
        return dense(x, params["weights"], b), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(
            open_f, self.layer_name, "DenseLayer",
            incoming_chans=self.incoming_chans, output_dim=self.output_dim,
            with_bias=self.with_bias)
        h5io.save_param_datasets(open_f, self.layer_name, self.learned_params,
                                 self.grads, self.weight_regulariser,
                                 self.with_bias, save_grads=save_grads)

    def load_from_h5(self, open_f, load_grads=True):
        # loading can change trace-time statics (stride/padding/
        # eps/...) that are NOT part of the jit key — drop stale traces
        self._jit_cache = {}
        info = open_f[self.layer_name + "/layer_info"].attrs
        self.incoming_chans = int(info["incoming_chans"])
        self.output_dim = int(info["output_dim"])
        self.with_bias = bool(info["with_bias"])
        self.weight_regulariser = h5io.load_param_datasets(
            open_f, self.layer_name, self.learned_params, self.grads,
            self.with_bias, load_grads=load_grads)
