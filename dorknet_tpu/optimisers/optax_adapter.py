"""Optax adapter — use any optax GradientTransformation through the framework's
optimiser API (and therefore inside the fused Trainer step).

The reference's optimiser surface is three hand-rolled rules (SGD/SGDMomentum/
RMSProp); on TPU the idiomatic ecosystem is optax, so this adapter exposes it
without changing the training loop:

    from dorknet_tpu.optimisers import OptaxOptimiser
    import optax
    opt = OptaxOptimiser(network, optax.adamw(1e-3))
    Trainer(network, opt).step(X, y)

``set_learning_rate``/``multiply_learning_rate`` work when the transformation
is built with ``optax.inject_hyperparams`` and an ``lr`` hyperparameter, e.g.
``optax.inject_hyperparams(lambda lr: optax.adamw(lr))(lr=1e-3)`` — the lr is
then threaded into the jitted update as a traced scalar (no retrace on
schedule changes).
"""

import optax

from dorknet_tpu.optimisers.base import Optimiser


class OptaxOptimiser(Optimiser):
    def __init__(self, network, transformation, learning_rate=0.0):
        super().__init__(network, learning_rate)
        self.transformation = transformation

    def init_cache(self, params):
        return self.transformation.init(params)

    def apply_update(self, params, grads, cache, lr):
        if hasattr(cache, "hyperparams") and "lr" in cache.hyperparams:
            cache.hyperparams["lr"] = lr
        updates, new_cache = self.transformation.update(grads, cache, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_cache
