"""L2 weight regulariser (reference: regularisers/l2.py:4-17).

``forward``/``backward`` are pure jnp expressions, so the network engine can fold
every layer's regularisation term and gradient into the single jitted train step
instead of the reference's per-layer Python calls
(reference: network/feed_forward_network.py:54-60)."""

import jax.numpy as jnp


class l2:
    def __init__(self, strength=0.005):
        self.type = "l2"
        self.strength = strength

    def __repr__(self):
        return "l2(strength={})".format(self.strength)

    def forward(self, X):
        return 0.5 * self.strength * jnp.sum(jnp.square(X))

    def backward(self, X):
        return self.strength * X
