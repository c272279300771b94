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

import itertools

import optax

from dorknet_tpu.optimisers.base import Optimiser

_INSTANCE_IDS = itertools.count()


class OptaxOptimiser(Optimiser):
    def __init__(self, network, transformation, learning_rate=None):
        """learning_rate=None (default) leaves the transformation's own lr
        untouched; pass a float ONLY when the transformation was built with
        inject_hyperparams and you want the framework's set_learning_rate /
        multiply_learning_rate schedule API to drive it."""
        super().__init__(network, learning_rate)
        self.transformation = transformation
        self._instance_id = next(_INSTANCE_IDS)

    def hyper_key(self):
        """An optax transformation's update rule is an opaque closure — two
        adapters can share the class name AND the state treedef while baking
        different hyperparameters (adamw(1e-3) vs adamw(1e-2)), so the
        generic (class, hypers) jit signature cannot distinguish them and a
        swapped-in optimiser would silently keep running the OLD traced
        update. Each instance therefore contributes a unique id to every jit
        signature (Trainer + update_weights): swapping adapters retraces."""
        return (self._instance_id,)

    def device_lr(self):
        if self.learning_rate is None:
            import jax.numpy as jnp
            return jnp.float32(0.0)  # placeholder, never injected
        return super().device_lr()

    def init_cache(self, params):
        return self.transformation.init(params)

    def apply_update(self, params, grads, cache, lr):
        # only override the injected lr when the user opted into framework-side
        # scheduling — a None learning_rate must not zero the transformation's
        # own configured lr
        if (self.learning_rate is not None
                and hasattr(cache, "hyperparams") and "lr" in cache.hyperparams):
            cache.hyperparams["lr"] = lr
        updates, new_cache = self.transformation.update(grads, cache, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_cache
