"""Plain SGD: W += -lr * g (reference: optimisers/SGD.py:20-24)."""

import jax

from dorknet_tpu.optimisers.base import Optimiser


class SGD(Optimiser):
    def __init__(self, network, learning_rate):
        super().__init__(network, learning_rate)

    def init_cache(self, params):
        return [{} for _ in params]

    def apply_update(self, params, grads, cache, lr):
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new_params, cache
