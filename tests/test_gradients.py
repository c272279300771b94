"""Autodiff gradients vs the reference's manual backward formulas and finite
differences (the reference's backward methods become regression tests here,
SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dorknet_tpu.ops import (
    conv2d, depthwise_conv2d, pointwise_conv2d,
    batch_norm_train, softmax_cross_entropy, softmax_probs, global_avg_pool,
)
from tests import oracles


def test_softmax_xent_grad_is_p_minus_y_over_B():
    logits = np.random.randn(5, 7).astype(np.float32)
    y1 = np.eye(7, dtype=np.float32)[np.random.randint(0, 7, 5)]
    y2 = np.eye(7, dtype=np.float32)[np.random.randint(0, 7, 5)]
    for y in [y1, 0.8 * y1 + 0.2 * y2]:  # one-hot AND soft labels
        _, _, ref_d = oracles.softmax_xent_oracle(logits, y)
        got = jax.grad(softmax_cross_entropy)(jnp.asarray(logits), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(got), ref_d, rtol=1e-4, atol=1e-6)


def test_batch_norm_dx_matches_reference_formula():
    x = np.random.randn(4, 5, 6, 6).astype(np.float32)
    gamma = (np.random.rand(5) + 0.5).astype(np.float32)
    beta = np.random.randn(5).astype(np.float32)
    dy = np.random.randn(4, 5, 6, 6).astype(np.float32)

    def f(x_):
        y, _, _ = batch_norm_train(
            x_.transpose(0, 2, 3, 1), jnp.asarray(gamma), jnp.asarray(beta),
            jnp.zeros(5), jnp.zeros(5), initialized=False)
        return jnp.sum(y.transpose(0, 3, 1, 2) * jnp.asarray(dy))

    got = np.asarray(jax.grad(f)(jnp.asarray(x)))
    ref = oracles.batch_norm_dx_oracle(x, gamma.reshape(1, -1, 1, 1), dy)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_batch_norm_dgamma_dbeta():
    x = np.random.randn(3, 4, 5, 5).astype(np.float32)
    gamma = (np.random.rand(4) + 0.5).astype(np.float32)
    beta = np.random.randn(4).astype(np.float32)
    dy = np.random.randn(3, 4, 5, 5).astype(np.float32)

    def f(g, b):
        y, _, _ = batch_norm_train(
            jnp.asarray(x.transpose(0, 2, 3, 1)), g, b,
            jnp.zeros(4), jnp.zeros(4), initialized=False)
        return jnp.sum(y.transpose(0, 3, 1, 2) * jnp.asarray(dy))

    dg, db = jax.grad(f, argnums=(0, 1))(jnp.asarray(gamma), jnp.asarray(beta))
    # Reference dgamma = sum(dy * x_hat), dbeta = sum(dy) over (0,2,3)
    # (layers/batch_norm.py:158-174).
    mean = x.mean(axis=(0, 2, 3)).reshape(1, -1, 1, 1)
    std = np.sqrt(x.var(axis=(0, 2, 3)) + 1e-5).reshape(1, -1, 1, 1)
    x_hat = (x - mean) / std
    np.testing.assert_allclose(np.asarray(dg), (dy * x_hat).sum(axis=(0, 2, 3)),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), dy.sum(axis=(0, 2, 3)),
                               rtol=1e-4, atol=1e-5)


def test_gap_grad_broadcast():
    x = np.random.randn(2, 3, 4, 4).astype(np.float32)
    dy = np.random.randn(2, 3).astype(np.float32)

    def f(x_):
        return jnp.sum(global_avg_pool(x_.transpose(0, 2, 3, 1)) * jnp.asarray(dy))

    got = np.asarray(jax.grad(f)(jnp.asarray(x)))
    # Reference backward broadcasts dy/(H*W) (layers/pooling.py:29-36).
    ref = np.broadcast_to(dy[:, :, None, None] / 16.0, x.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def _finite_diff(f, x, eps=1e-3):
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gflat = g.reshape(-1)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig + eps
        fp = float(f(x))
        flat[i] = orig - eps
        fm = float(f(x))
        flat[i] = orig
        gflat[i] = (fp - fm) / (2 * eps)
    return g


@pytest.mark.parametrize("op", ["conv", "depthwise", "pointwise"])
def test_conv_weight_grads_finite_diff(op):
    x = np.random.randn(2, 3, 6, 6).astype(np.float64).astype(np.float32)
    if op == "conv":
        w0 = np.random.randn(4, 3, 3, 3).astype(np.float32)
        run = lambda w: conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w),
                               None, 1, 1)
    elif op == "depthwise":
        w0 = np.random.randn(3, 3, 3).astype(np.float32)
        run = lambda w: depthwise_conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                         jnp.asarray(w), None, 1, 1)
    else:
        w0 = np.random.randn(4, 3).astype(np.float32)
        run = lambda w: pointwise_conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                         jnp.asarray(w), None, 2)

    def scalar(w):
        return float(jnp.sum(jnp.sin(run(w))))

    got = np.asarray(jax.grad(lambda w: jnp.sum(jnp.sin(run(w))))(jnp.asarray(w0)))
    ref = _finite_diff(scalar, w0.copy())
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)
