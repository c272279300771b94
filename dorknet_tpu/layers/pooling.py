"""Pooling layers.

GlobalAveragePoolingLayer matches the reference (layers/pooling.py:10-43).

MaxPoolLayer: the reference version (layers/pooling.py:45-77) is square
window == stride via a Cython kernel, but ships incomplete — missing
``super().__init__`` and h5 io, and absent from the checkpoint-load dispatch.
We keep its constructor signature (input_shape positional arg accepted and
unused, as there) while fixing those defects: proper base init, h5 io, and
registration in the load dispatch (see network/feed_forward_network.py here)."""

from dorknet_tpu.layers.registry import register_layer
from dorknet_tpu.layers.base import Layer
from dorknet_tpu.ops.pool import max_pool, global_avg_pool
from dorknet_tpu.utils import h5io


@register_layer
class GlobalAveragePoolingLayer(Layer):
    """Mean over spatial dims: (N,C,H,W) -> (N,C); backward broadcasts 1/(H*W)
    (reference: layers/pooling.py:29-36) — autodiff reproduces it."""

    def __init__(self, layer_name):
        super().__init__(layer_name)

    def __repr__(self):
        return "GlobalAveragePoolingLayer({})".format(self.layer_name)

    def fapply(self, params, state, x, train):
        return global_avg_pool(x), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(open_f, self.layer_name, "GlobalAveragePoolingLayer")

    def load_from_h5(self, open_f, load_grads=True):
        # loading can change trace-time statics (stride/padding/
        # eps/...) that are NOT part of the jit key — drop stale traces
        self._jit_cache = {}
        pass


@register_layer
class MaxPoolLayer(Layer):
    def __init__(self, layer_name, input_shape=None, stride=2):
        """Only does square pooling regions (window size == stride)."""
        super().__init__(layer_name)
        self.stride = stride

    def __repr__(self):
        return "MaxPoolLayer(stride={})".format(self.stride)

    def fapply(self, params, state, x, train):
        return max_pool(x, self.stride), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(open_f, self.layer_name, "MaxPoolLayer",
                               stride=self.stride)

    def load_from_h5(self, open_f, load_grads=True):
        # loading can change trace-time statics (stride/padding/
        # eps/...) that are NOT part of the jit key — drop stale traces
        self._jit_cache = {}
        self.stride = int(open_f[self.layer_name + "/layer_info"].attrs["stride"])
