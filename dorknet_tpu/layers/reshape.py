"""Reshape layer.

The reference's ReshapeLayer (layers/reshape.py) is broken (a ``super.__init__``
typo) and unused; provided here in working form for API completeness. Reshapes
are expressed over the public NCHW layout."""

from dorknet_tpu.layers.registry import register_layer
from dorknet_tpu.layers.base import Layer, to_nchw, to_nhwc
from dorknet_tpu.utils import h5io


@register_layer
class ReshapeLayer(Layer):
    def __init__(self, layer_name, new_shape=None):
        super().__init__(layer_name)
        self.new_shape = tuple(new_shape) if new_shape is not None else None

    def __repr__(self):
        return "ReshapeLayer({}, new_shape={})".format(self.layer_name, self.new_shape)

    def fapply(self, params, state, x, train):
        # Reshape semantics are defined on the reference's NCHW layout; convert,
        # reshape with the batch dim preserved, convert back if still 4-D.
        x = to_nchw(x)
        y = x.reshape((x.shape[0],) + self.new_shape)
        return to_nhwc(y), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(open_f, self.layer_name, "ReshapeLayer",
                               new_shape=list(self.new_shape))

    def load_from_h5(self, open_f, load_grads=True):
        self.new_shape = tuple(int(v) for v in
                               open_f[self.layer_name + "/layer_info"].attrs["new_shape"])
