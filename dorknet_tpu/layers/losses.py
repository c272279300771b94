"""Softmax + cross-entropy loss layer.

Parity with the reference SoftmaxWithCrossEntropy (layers/losses.py:5-41):
``forward(X, y_one_hot)`` returns ``(loss, probs)`` where loss is
mean(-log(p . y)) — supporting soft/mixup labels — and ``backward()`` returns
``(p - y)/B`` ignoring any upstream value. Test mode returns ``(0, probs)``.
The numerically-stabilised softmax + pinned (p-y)/B gradient live in
``ops.loss`` (see that module for the soft-label forward/backward mismatch the
reference carries, reproduced exactly)."""

import jax
import numpy as np
import jax.numpy as jnp

from dorknet_tpu.layers.registry import register_layer
from dorknet_tpu.layers.base import Layer
from dorknet_tpu.ops.loss import softmax_probs, softmax_cross_entropy
from dorknet_tpu.utils import h5io


@register_layer
class SoftmaxWithCrossEntropy(Layer):
    def __init__(self, layer_name):
        super().__init__(layer_name)
        self._cached_probs = None
        self._cached_y = None

    def __repr__(self):
        return "SoftmaxWithCrossEntropy({})".format(self.layer_name)

    def fapply_loss(self, logits, y_soft):
        """Pure (loss, probs) pair used by the network engine."""
        return softmax_cross_entropy(logits, y_soft), softmax_probs(logits)

    def forward(self, X, y_one_hot=None, test_mode=False):
        X = jnp.asarray(X, dtype=jnp.float32)
        probs_fn = self._jit_for(("probs",), softmax_probs)
        if test_mode:
            return 0, probs_fn(X)
        y_one_hot = jnp.asarray(y_one_hot, dtype=jnp.float32)
        loss_fn = self._jit_for(("loss",), self.fapply_loss)
        loss, probs = loss_fn(X, y_one_hot)
        self._cached_probs = probs
        self._cached_y = y_one_hot
        return loss, probs

    def backward(self, upstream_dx=None):
        """upstream_dx is not used (reference: layers/losses.py:29-34)."""
        B = self._cached_probs.shape[0]
        return (self._cached_probs - self._cached_y) / float(B)

    def save_to_h5(self, open_f, save_grads=True):
        h5io.create_layer_info(open_f, self.layer_name, "SoftmaxWithCrossEntropy")

    def load_from_h5(self, open_f, load_grads=True):
        pass
