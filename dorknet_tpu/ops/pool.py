"""Pooling ops.

Max pooling in the reference is a square, non-overlapping window whose size
equals the stride (reference: layers/pooling_cy.pyx:10-69, layers/pooling.py:45-77);
its backward pass routes gradient through a cached 0/1 argmax mask. On TPU this is
``lax.reduce_window`` with window == stride, and autodiff through it reproduces the
mask-routing (tie-breaking at equal maxima may differ by an equivalent subgradient).

Global average pooling (reference: layers/pooling.py:10-43) is a spatial mean whose
gradient is the broadcast 1/(H*W) — autodiff gives exactly that.
"""

import jax.numpy as jnp
from jax import lax


def max_pool(x, stride):
    """Non-overlapping max pool, window = stride. x: (N,H,W,C)."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, stride, stride, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def global_avg_pool(x):
    """Spatial mean: (N,H,W,C) -> (N,C)."""
    return jnp.mean(x, axis=(1, 2))
