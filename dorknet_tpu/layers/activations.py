"""ReLU activation.

The reference caches a 0/1 ``positive_locs`` mask computed as ``out > 0`` during
training forward and multiplies it into the upstream gradient
(reference: layers/activations.py:14-47, layers/relu_cy.pyx). We express ReLU as
``jnp.where(x > 0, x, 0)`` whose autodiff gradient is exactly that mask
(strictly zero at x == 0, matching the reference's semantics), and the mask trick
itself dissolves into the fused XLA graph."""

import numpy as np
import jax.numpy as jnp

from dorknet_tpu.layers.registry import register_layer
from dorknet_tpu.layers.base import Layer
from dorknet_tpu.utils import h5io


@register_layer
class ReLu(Layer):
    def __init__(self, layer_name):
        super().__init__(layer_name)

    def __repr__(self):
        return "ReLu({})".format(self.layer_name)

    def fapply(self, params, state, x, train):
        return jnp.where(x > 0, x, jnp.zeros_like(x)), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(open_f, self.layer_name, "ReLu")

    def load_from_h5(self, open_f, load_grads=True):
        pass


@register_layer
class ReLu6(Layer):
    """min(max(x, 0), 6) — for the MobileNet-V2 stretch zoo (not in the
    reference, which is plain-ReLU only)."""

    def __init__(self, layer_name):
        super().__init__(layer_name)

    def __repr__(self):
        return "ReLu6({})".format(self.layer_name)

    def fapply(self, params, state, x, train):
        return jnp.clip(x, 0.0, 6.0), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(open_f, self.layer_name, "ReLu6")

    def load_from_h5(self, open_f, load_grads=True):
        pass


@register_layer
class IdentityLayer(Layer):
    """Pass-through — lets ResidualBlock model linear-join blocks (e.g.
    MobileNet-V2 inverted residuals, which add WITHOUT a post-skip
    nonlinearity; the reference always applies one, residual_block.py:74)."""

    def __init__(self, layer_name):
        super().__init__(layer_name)

    def __repr__(self):
        return "IdentityLayer({})".format(self.layer_name)

    def fapply(self, params, state, x, train):
        return x, state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(open_f, self.layer_name, "IdentityLayer")

    def load_from_h5(self, open_f, load_grads=True):
        pass


@register_layer
class HardSwish(Layer):
    """x * relu6(x + 3) / 6 — MobileNet-V3's cheap swish approximation
    (elementwise VPU math, fuses into the surrounding graph; not in the
    reference, whose zoo is plain-ReLU only)."""

    def __init__(self, layer_name):
        super().__init__(layer_name)

    def __repr__(self):
        return "HardSwish({})".format(self.layer_name)

    def fapply(self, params, state, x, train):
        return x * (jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)).astype(x.dtype), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(open_f, self.layer_name, "HardSwish")

    def load_from_h5(self, open_f, load_grads=True):
        pass


@register_layer
class HardSigmoid(Layer):
    """relu6(x + 3) / 6 — the gating nonlinearity of MobileNet-V3's
    squeeze-excite blocks."""

    def __init__(self, layer_name):
        super().__init__(layer_name)

    def __repr__(self):
        return "HardSigmoid({})".format(self.layer_name)

    def fapply(self, params, state, x, train):
        return (jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)).astype(x.dtype), state

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(open_f, self.layer_name, "HardSigmoid")

    def load_from_h5(self, open_f, load_grads=True):
        pass
