"""Residual block: a composite layer with a skip connection.

Parity with the reference ResidualBlock (layers/residual_block.py:12-151):
``layer_list`` runs in sequence, ``skip_projection`` (or identity) bridges the
input, the two join by addition and ``post_skip_activation`` follows. h5 schema
(flat-namespace children + attr-encoded structure) is identical.

One reference quirk reproduced deliberately: ``regulariser_forward`` sums only
over ``layer_list`` — the skip projection's l2 term is NOT reported in the loss
(reference :78-84) — yet the skip projection's backward DOES apply its l2
gradient (layers/pointwise_convolution.py:63-64). We therefore expose both
accountings: ``reg_loss`` (reported, reference accounting) and ``reg_loss_full``
(every regulariser, what the applied gradient must contain). The network engine
differentiates the full sum but reports the reference sum."""

from dorknet_tpu.layers.registry import register_layer, get_layer_class
from dorknet_tpu.layers.base import Layer
from dorknet_tpu.utils import h5io


@register_layer
class ResidualBlock(Layer):
    def __init__(self, layer_name, layer_list=None, skip_projection=None,
                 post_skip_activation=None):
        super().__init__(layer_name)
        if layer_list and post_skip_activation is None:
            # (a bare ResidualBlock(name) is the load_from_h5 path and stays
            # legal — the checkpoint supplies the activation)
            raise ValueError(
                "ResidualBlock '{}' built with a layer_list needs a "
                "post_skip_activation — use ReLu(...) or, for a linear "
                "join, layers.IdentityLayer(...)".format(layer_name))
        self.layer_list = layer_list if layer_list is not None else []
        self.skip_projection = skip_projection
        self.post_skip_activation = post_skip_activation

    def __repr__(self):
        return "ResidualBlock({}, layer_list={}, skip_projection={}, post_skip_activation={})".format(
            self.layer_name, self.layer_list, self.skip_projection,
            self.post_skip_activation)

    def _children(self):
        out = list(self.layer_list)
        if self.skip_projection is not None:
            out.append(self.skip_projection)
        if self.post_skip_activation is not None:
            out.append(self.post_skip_activation)
        return out

    def to_gpu(self):
        if self.is_on_gpu:
            print("Layer already on GPU, ignoring request")
        else:
            for child in self._children():
                child.to_gpu()
            self.is_on_gpu = True

    # -- functional protocol ------------------------------------------------ #
    def _trace_signature(self):
        return tuple(c._trace_signature() for c in self._children())

    def bn_initialized(self):
        """False when ANY nested batch-norm is pre-first-step (see
        Layer.bn_initialized) — multi_step/accumulate_step guard on this."""
        return all(c.bn_initialized() for c in self._children())

    def get_params(self):
        return {
            "layers": [l.get_params() for l in self.layer_list],
            "skip": self.skip_projection.get_params() if self.skip_projection is not None else {},
            "act": self.post_skip_activation.get_params(),
        }

    def set_params(self, tree):
        for l, t in zip(self.layer_list, tree["layers"]):
            l.set_params(t)
        if self.skip_projection is not None:
            self.skip_projection.set_params(tree["skip"])
        self.post_skip_activation.set_params(tree["act"])

    def set_grads(self, tree):
        for l, t in zip(self.layer_list, tree["layers"]):
            l.set_grads(t)
        if self.skip_projection is not None:
            self.skip_projection.set_grads(tree["skip"])
        self.post_skip_activation.set_grads(tree["act"])

    def get_grads(self):
        return {
            "layers": [l.get_grads() for l in self.layer_list],
            "skip": self.skip_projection.get_grads() if self.skip_projection is not None else {},
            "act": self.post_skip_activation.get_grads(),
        }

    def get_state(self):
        return {
            "layers": [l.get_state() for l in self.layer_list],
            "skip": self.skip_projection.get_state() if self.skip_projection is not None else {},
            "act": self.post_skip_activation.get_state(),
        }

    def set_state(self, tree):
        for l, t in zip(self.layer_list, tree["layers"]):
            l.set_state(t)
        if self.skip_projection is not None:
            self.skip_projection.set_state(tree["skip"])
        self.post_skip_activation.set_state(tree["act"])

    def fapply(self, params, state, x, train):
        h = x
        new_layer_states = []
        for i, l in enumerate(self.layer_list):
            h, s = l.fapply(params["layers"][i], state["layers"][i], h, train)
            new_layer_states.append(s)
        if self.skip_projection is not None:
            skip, skip_state = self.skip_projection.fapply(
                params["skip"], state["skip"], x, train)
        else:
            skip, skip_state = x, state["skip"]
        y, act_state = self.post_skip_activation.fapply(
            params["act"], state["act"], h + skip, train)
        return y, {"layers": new_layer_states, "skip": skip_state, "act": act_state}

    def reg_loss(self, params):
        """Reference accounting: layer_list only (reference :78-84)."""
        total = 0.0
        for l, p in zip(self.layer_list, params["layers"]):
            total = total + l.reg_loss(p)
        return total

    def reg_loss_full(self, params):
        """Every regulariser, including the skip projection's — this is what the
        reference's *applied gradient* contains."""
        total = self.reg_loss(params)
        if self.skip_projection is not None:
            total = total + self.skip_projection.reg_loss(params["skip"])
        return total

    def regulariser_forward(self):
        regularisation = 0
        for l in self.layer_list:
            if hasattr(l, "regulariser_forward"):
                regularisation += l.regulariser_forward()
        return regularisation

    # -- checkpointing ------------------------------------------------------ #
    def save_to_h5(self, open_f, save_grads=True):
        attrs = {
            "layer_type_list": [l.__class__.__name__ for l in self.layer_list],
            "layer_name_list": [l.layer_name for l in self.layer_list],
            "post_skip_activation_type": self.post_skip_activation.__class__.__name__,
            "post_skip_activation_name": self.post_skip_activation.layer_name,
        }
        if self.skip_projection is not None:
            attrs["skip_projection_type"] = self.skip_projection.__class__.__name__
            attrs["skip_projection_name"] = self.skip_projection.layer_name
        h5io.create_layer_info(open_f, self.layer_name, "ResidualBlock", **attrs)
        for l in self.layer_list:
            l.save_to_h5(open_f, save_grads=save_grads)
        if self.skip_projection is not None:
            self.skip_projection.save_to_h5(open_f, save_grads=save_grads)
        self.post_skip_activation.save_to_h5(open_f, save_grads=save_grads)

    def load_from_h5(self, open_f, load_grads=True):
        info = open_f[self.layer_name + "/layer_info"].attrs
        layer_type_list = info["layer_type_list"]
        layer_name_list = info["layer_name_list"]
        for l_type, layer_name in zip(layer_type_list, layer_name_list):
            self.layer_list.append(get_layer_class(l_type)(layer_name))
        for l in self.layer_list:
            l.load_from_h5(open_f, load_grads=load_grads)
        if info.get("skip_projection_type", None):
            skip_type = info["skip_projection_type"]
            skip_name = info["skip_projection_name"]
            self.skip_projection = get_layer_class(skip_type)(skip_name)
            self.skip_projection.load_from_h5(open_f, load_grads=load_grads)
        act_type = info["post_skip_activation_type"]
        act_name = info["post_skip_activation_name"]
        self.post_skip_activation = get_layer_class(act_type)(act_name)
        self.post_skip_activation.load_from_h5(open_f, load_grads=load_grads)
