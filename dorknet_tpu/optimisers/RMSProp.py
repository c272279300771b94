"""RMSProp, matching the reference's accumulator form exactly
(reference: optimisers/RMSProp.py:28-36):

    c = d*c + (1-d)*g^2 ;  W -= lr * g / sqrt(c + 1e-5)

(The reference's numpy-only cache made it GPU-incompatible and its composite
traversal was buggy — both fixed by the pytree base, see optimisers/base.py.)
"""

import jax
import jax.numpy as jnp

from dorknet_tpu.optimisers.base import Optimiser


class RMSProp(Optimiser):
    def __init__(self, network, learning_rate, decay_rate):
        super().__init__(network, learning_rate)
        self.decay_rate = decay_rate
        self.grad_cache = self.init_cache(self.gather_params())

    def hyper_key(self):
        return (float(self.decay_rate),)

    def apply_update(self, params, grads, cache, lr):
        new_cache = jax.tree_util.tree_map(
            lambda c, g: self.decay_rate * c + (1.0 - self.decay_rate) * jnp.square(g),
            cache, grads)
        new_params = jax.tree_util.tree_map(
            lambda p, g, c: p - lr * g / jnp.sqrt(c + 1e-5),
            params, grads, new_cache)
        return new_params, new_cache
