"""Batch normalisation with the reference's exact state semantics.

The reference (layers/batch_norm.py:54-115) differs from textbook BN in two ways
that matter for numerics parity:

* it keeps an EMA of the running **std** (sqrt(var+eps)), not the running var,
  with momentum 0.95, and the *first* training batch initialises the running
  stats directly to the batch stats (no EMA on step one);
* inference normalises by ``(x - running_mean) / running_std`` with eps already
  folded into the stored std.

Under a sharded-batch jit, ``jnp.mean`` over the batch axis has *global*
semantics — XLA inserts the cross-replica reduction over ICI — so data-parallel
training gets synchronised (cross-replica) batch-norm for free.

State updates are wrapped in ``stop_gradient``: the reference never backprops
through the EMA, and the manual dx formula it uses
(reference: layers/batch_norm.py:124-156) is exactly the autodiff gradient of the
batch-stat normalisation below (verified by tests/test_gradients.py).
"""

import jax
import jax.numpy as jnp


def batch_norm_train(x, gamma, beta, running_mean, running_std, momentum=0.95,
                     eps=1e-5, initialized=True):
    """Train-mode BN over a 2-D (N,C) or 4-D (N,H,W,C) input.

    gamma/beta/running stats are 1-D (C,). Returns (y, new_running_mean,
    new_running_std). ``initialized`` is a *static* Python bool: False on the very
    first training step (running stats adopt batch stats directly,
    reference: layers/batch_norm.py:76-89).
    """
    axis = (0, 1, 2) if x.ndim == 4 else (0,)
    # statistics and normalisation in fp32 regardless of the activation dtype
    # (bf16 flow keeps y in the input dtype, stats stay exact-ish)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis)
    var = jnp.var(xf, axis=axis)
    std = jnp.sqrt(var + eps)
    shape = (1, 1, 1, -1) if x.ndim == 4 else (1, -1)
    x_hat = (xf - mean.reshape(shape)) / std.reshape(shape)
    y = (gamma.reshape(shape) * x_hat + beta.reshape(shape)).astype(x.dtype)

    m, s = jax.lax.stop_gradient((mean, std))
    if initialized:
        new_mean = momentum * running_mean + (1.0 - momentum) * m
        new_std = momentum * running_std + (1.0 - momentum) * s
    else:
        new_mean, new_std = m, s
    return y, new_mean, new_std


def batch_norm_inference(x, gamma, beta, running_mean, running_std):
    """Test-mode BN: normalise by the stored running mean/std
    (reference: layers/batch_norm.py:101-115)."""
    shape = (1, 1, 1, -1) if x.ndim == 4 else (1, -1)
    xf = x.astype(jnp.float32)
    x_hat = (xf - running_mean.reshape(shape)) / running_std.reshape(shape)
    return (gamma.reshape(shape) * x_hat + beta.reshape(shape)).astype(x.dtype)
