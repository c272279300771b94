"""Cross-framework oracle: the functional ops vs torch (CPU) equivalents.

Independent of tests/oracles.py (hand-transliterated NumPy): any transcription
error shared with the reference reading would still diverge from torch here."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from dorknet_tpu.ops import (conv2d, depthwise_conv2d, pointwise_conv2d, dense,
                             batch_norm_train, softmax_cross_entropy)


def nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def nchw(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("stride,padding", [(1, 1), (2, 2)])
def test_conv2d_vs_torch(stride, padding):
    x = np.random.randn(2, 3, 13, 13).astype(np.float32)
    w = np.random.randn(6, 3, 5, 5).astype(np.float32)
    b = np.random.randn(6).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), stride=stride, padding=padding).numpy()
    got = nchw(conv2d(nhwc(x), jnp.asarray(w), jnp.asarray(b), stride, padding))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_depthwise_vs_torch():
    x = np.random.randn(2, 8, 11, 11).astype(np.float32)
    w = np.random.randn(8, 3, 3).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w[:, None]),
                   None, stride=1, padding=1, groups=8).numpy()
    got = nchw(depthwise_conv2d(nhwc(x), jnp.asarray(w), None, 1, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pointwise_stride1_vs_torch():
    x = np.random.randn(2, 5, 9, 9).astype(np.float32)
    w = np.random.randn(7, 5).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w[:, :, None, None]),
                   None).numpy()
    got = nchw(pointwise_conv2d(nhwc(x), jnp.asarray(w), None, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_batch_norm_train_vs_torch():
    x = np.random.randn(4, 6, 7, 7).astype(np.float32)
    gamma = (np.random.rand(6) + 0.5).astype(np.float32)
    beta = np.random.randn(6).astype(np.float32)
    ref = F.batch_norm(torch.from_numpy(x), None, None,
                       torch.from_numpy(gamma), torch.from_numpy(beta),
                       training=True, momentum=0.0, eps=1e-5).numpy()
    y, _, _ = batch_norm_train(nhwc(x), jnp.asarray(gamma), jnp.asarray(beta),
                               jnp.zeros(6), jnp.zeros(6), initialized=False)
    np.testing.assert_allclose(nchw(y), ref, rtol=1e-3, atol=1e-4)


def test_softmax_ce_grad_vs_torch():
    logits = np.random.randn(5, 9).astype(np.float32)
    y_idx = np.random.randint(0, 9, 5)
    y = np.eye(9, dtype=np.float32)[y_idx]

    t = torch.from_numpy(logits.copy()).requires_grad_(True)
    loss_t = F.cross_entropy(t, torch.from_numpy(y_idx))
    loss_t.backward()

    loss_j = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
    grad_j = jax.grad(softmax_cross_entropy)(jnp.asarray(logits), jnp.asarray(y))
    np.testing.assert_allclose(loss_j, float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_j), t.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
