"""Softmax + cross-entropy with the reference's exact forward value AND gradient.

The reference (layers/losses.py:13-34) computes

    p    = softmax(logits)            # NB: without max-subtraction
    loss = mean_b( -log( sum_c p[b,c] * y[b,c] ) )
    dlogits = (p - y) / B             # backward, regardless of soft labels

For one-hot y the loss and gradient are the textbook pair. For *soft* labels
(mixup) they are NOT consistent with each other: -log(p.y) is reported, but the
gradient applied is that of sum_c -y_c log p_c. We reproduce both behaviours
exactly — the forward value via the same -log(p.y) expression (computed with a
numerically-stabilised softmax, identical in exact arithmetic and within fp32
tolerance of the reference's raw exp) and the gradient pinned to (p - y)/B via
``jax.custom_vjp``.
"""

import jax
import jax.numpy as jnp


def softmax_probs(logits):
    """Row softmax, max-stabilised (equal to reference's raw-exp softmax in exact
    arithmetic; the reference skips stabilisation, layers/losses.py:15-16).
    Always computed in fp32 (upcast under the bf16 activation flow)."""
    logits = logits.astype(jnp.float32)
    z = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    e = jnp.exp(z)
    return e / jnp.sum(e, axis=1, keepdims=True)


@jax.custom_vjp
def softmax_cross_entropy(logits, y_soft):
    """Mean -log(p . y) over the batch, gradient (p - y)/B w.r.t. logits."""
    p = softmax_probs(logits)
    return jnp.mean(-jnp.log(jnp.sum(p * y_soft, axis=1)))


def _sce_fwd(logits, y_soft):
    p = softmax_probs(logits)
    loss = jnp.mean(-jnp.log(jnp.sum(p * y_soft, axis=1)))
    return loss, (p, y_soft)


def _sce_bwd(res, g):
    p, y = res
    B = p.shape[0]
    return (g * (p - y) / B, None)


softmax_cross_entropy.defvjp(_sce_fwd, _sce_bwd)
