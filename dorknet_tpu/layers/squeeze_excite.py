"""Squeeze-and-Excitation layer (MobileNet-V3 / SENet-style channel gating).

Not in the reference (its zoo stops at the depthwise-separable ResNet-18,
reference examples/imagenet_dogs_225_resnet_18_depsep.py); added for the
MobileNet-V3 stretch family. TPU shape: the squeeze is a global average pool
(one reduction), the two FC stages are tiny (C×C/4) MXU matmuls via the same
``ops.conv.dense`` primitive every Dense layer uses (inherits the compute-
dtype/precision policy), and the excite is one fused elementwise multiply —
the whole layer is a few percent of a block's HBM traffic.

    s = mean(x, spatial)                    # (N, C)      "squeeze"
    h = relu(s @ w_reduce + b_reduce)       # (N, C_r)
    g = hardsigmoid(h @ w_expand + b_expand)  # (N, C)    "excite"
    y = x * g[:, None, None, :]

Checkpoint schema follows the house per-layer pattern: layer_info attrs
(incoming_chans, reduced_chans) + four weight/bias datasets with grads.
"""

import jax.numpy as jnp

from dorknet_tpu.layers.registry import register_layer
from dorknet_tpu.layers.base import Layer, init_weights
from dorknet_tpu.ops.conv import dense
from dorknet_tpu.utils import h5io

_PARAM_KEYS = ("w_reduce", "b_reduce", "w_expand", "b_expand")


@register_layer
class SqueezeExciteLayer(Layer):
    def __init__(self, layer_name, incoming_chans=None, reduced_chans=None,
                 weight_regulariser=None,
                 weight_initialiser="glorot_uniform"):
        super().__init__(layer_name)
        self.incoming_chans = incoming_chans
        self.reduced_chans = reduced_chans
        self.weight_regulariser = weight_regulariser
        self.weight_initialiser = weight_initialiser
        if incoming_chans is not None:
            if reduced_chans is None:
                reduced_chans = max(8, incoming_chans // 4)
                self.reduced_chans = reduced_chans
            C, Cr = incoming_chans, reduced_chans
            self.learned_params = {
                "w_reduce": init_weights((C, Cr), weight_initialiser, C, Cr),
                "b_reduce": jnp.zeros(Cr, jnp.float32),
                "w_expand": init_weights((Cr, C), weight_initialiser, Cr, C),
                "b_expand": jnp.zeros(C, jnp.float32),
            }
            self.grads = {k: jnp.zeros_like(v)
                          for k, v in self.learned_params.items()}
        else:
            self.learned_params = {}
            self.grads = {}

    def __repr__(self):
        return ("SqueezeExciteLayer({}, incoming_chans={}, reduced_chans={}, "
                "weight_regulariser={})".format(
                    self.layer_name, self.incoming_chans, self.reduced_chans,
                    repr(self.weight_regulariser)))

    def fapply(self, params, state, x, train):
        # squeeze in fp32 (mean of a possibly-bf16 activation)
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))        # (N, C)
        h = dense(s, params["w_reduce"], params["b_reduce"])
        h = jnp.where(h > 0, h, jnp.zeros_like(h))
        g = dense(h, params["w_expand"], params["b_expand"])
        g = jnp.clip(g.astype(jnp.float32) + 3.0, 0.0, 6.0) * (1.0 / 6.0)
        return x * g[:, None, None, :].astype(x.dtype), state

    def reg_loss(self, params):
        if self.weight_regulariser is not None and params:
            return (self.weight_regulariser.forward(params["w_reduce"])
                    + self.weight_regulariser.forward(params["w_expand"]))
        return 0.0

    def regulariser_forward(self):
        return self.reg_loss(self.learned_params)

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(
            open_f, self.layer_name, "SqueezeExciteLayer",
            incoming_chans=self.incoming_chans,
            reduced_chans=self.reduced_chans)
        for k in _PARAM_KEYS:
            d = h5io.save_array(open_f, self.layer_name + "/" + k,
                                self.learned_params[k])
            if k == "w_reduce":
                h5io.attach_regulariser_attrs(d, self.weight_regulariser)
            if save_grads:
                h5io.save_array(open_f, self.layer_name + "/grads/" + k,
                                self.grads[k])

    def load_from_h5(self, open_f, load_grads=True):
        self._jit_cache = {}
        info = open_f[self.layer_name + "/layer_info"].attrs
        self.incoming_chans = int(info["incoming_chans"])
        self.reduced_chans = int(info["reduced_chans"])
        for k in _PARAM_KEYS:
            self.learned_params[k] = jnp.asarray(
                open_f[self.layer_name + "/" + k][:])
            if load_grads:
                self.grads[k] = jnp.asarray(
                    open_f[self.layer_name + "/grads/" + k][:])
        self.weight_regulariser = h5io.load_regulariser(
            open_f[self.layer_name + "/w_reduce"])
