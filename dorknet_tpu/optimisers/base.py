"""Optimiser base: one jitted pytree update instead of a per-param Python loop.

The reference optimisers walk a (layer, param) Python loop issuing one in-place
array op per parameter per step (reference: optimisers/SGDMomentum.py:31-39).
Here the whole update is a single jitted ``tree_map`` over the network's params
pytree — one XLA program, buffers donated.

Composite-layer traversal: the reference's SGD/RMSProp re-append the outer layer
instead of the inner one (a bug — ResidualBlock inner params never update,
reference: optimisers/SGD.py:8-11), and no reference optimiser ever updates a
ResidualBlock's ``skip_projection`` / ``post_skip_activation`` (only
``layer_list`` is walked, optimisers/SGDMomentum.py:8-14). Both defects are
fixed here: we update through each top-level layer's full params pytree, which
includes every nested child. (Divergence from reference noted per SURVEY §2.4.)
"""

import jax
import jax.numpy as jnp


def _has_params(layer):
    return len(jax.tree_util.tree_leaves(layer.get_params())) > 0


class Optimiser:
    def __init__(self, network, learning_rate):
        self.network = network
        self.learnable_layers = [l for l in network.layers if _has_params(l)]
        self._layers_version = network._version
        self.learning_rate = learning_rate
        self._update_jit = None

    def _refresh_layers(self):
        """Re-derive learnable_layers when the network's structure changed
        (layers added, or a checkpoint load repopulated them) — a stale
        construction-time snapshot would make update_weights() silently skip
        the new layers while the loop runs without error. The reference has
        the same snapshot-at-init shape (optimisers/SGDMomentum.py:8-14) but
        its scripts always construct the optimiser last; this API can't
        assume that. (grad_cache is keyed per (layer, param) lazily, so a
        refresh simply grows it on the next update.)"""
        if self._layers_version != self.network._version:
            self.learnable_layers = [l for l in self.network.layers
                                     if _has_params(l)]
            self._layers_version = self.network._version
            self.grad_cache = None  # re-init over the new params tree

    def set_learning_rate(self, new_lr):
        self.learning_rate = new_lr
        self._device_lr = None

    def multiply_learning_rate(self, multiplier):
        self.learning_rate *= multiplier
        self._device_lr = None

    def device_lr(self):
        """Device-resident lr scalar, cached until the schedule changes —
        avoids one host→device transfer per step (measurably slow through the
        TPU host link)."""
        if getattr(self, "_device_lr", None) is None:
            self._device_lr = jnp.float32(self.learning_rate)
        return self._device_lr

    # -- pytree plumbing ---------------------------------------------------- #
    def gather_params(self):
        self._refresh_layers()
        return [l.get_params() for l in self.learnable_layers]

    def gather_grads(self):
        self._refresh_layers()
        return [l.get_grads() for l in self.learnable_layers]

    def scatter_params(self, new_params):
        self._refresh_layers()
        for l, p in zip(self.learnable_layers, new_params):
            l.set_params(p)

    # -- functional update (overridden; used by both paths) ------------------ #
    def init_cache(self, params):
        """Optimiser state pytree for ``params`` ({} if stateless)."""
        return jax.tree_util.tree_map(jnp.zeros_like, params)

    def apply_update(self, params, grads, cache, lr):
        """Pure: (params, grads, cache, lr) -> (new_params, new_cache)."""
        raise NotImplementedError

    def hyper_key(self):
        """Hashable tuple of every hyperparameter BAKED INTO the traced update
        (lr is excluded — it flows as a traced scalar via device_lr()).
        Jit caches (here and in Trainer) key on this so mutating e.g.
        ``opt.momentum`` mid-run retraces instead of silently keeping the old
        value."""
        return ()

    # -- reference-compatible API -------------------------------------------- #
    def update_weights(self):
        params = self.gather_params()
        grads = self.gather_grads()
        if getattr(self, "grad_cache", None) is None:
            self.grad_cache = self.init_cache(params)
        from dorknet_tpu.config import trace_signature

        key = self.hyper_key() + trace_signature()
        if self._update_jit is None or getattr(self, "_jit_hyper", None) != key:
            def _fresh(p, g, c, lr, _f=self.apply_update):
                return _f(p, g, c, lr)

            self._update_jit = jax.jit(_fresh, donate_argnums=(0, 2))
            self._jit_hyper = key
        new_params, self.grad_cache = self._update_jit(
            params, grads, self.grad_cache, self.device_lr())
        self.scatter_params(new_params)
