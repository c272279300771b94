"""SGD with momentum, matching the reference's velocity form exactly
(reference: optimisers/SGDMomentum.py:31-39):

    dx = -lr * g + momentum * v ;  W += dx ;  v = dx
"""

import jax

from dorknet_tpu.optimisers.base import Optimiser


class SGDMomentum(Optimiser):
    def __init__(self, network, learning_rate, momentum):
        super().__init__(network, learning_rate)
        self.momentum = momentum
        self.grad_cache = self.init_cache(self.gather_params())

    def hyper_key(self):
        return (float(self.momentum),)

    def apply_update(self, params, grads, cache, lr):
        dx = jax.tree_util.tree_map(
            lambda g, v: -lr * g + self.momentum * v, grads, cache)
        new_params = jax.tree_util.tree_map(lambda p, d: p + d, params, dx)
        return new_params, dx
