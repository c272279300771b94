"""Forward numerics of the functional ops vs NumPy oracles (fp32 tolerance)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dorknet_tpu.ops import (
    conv2d, depthwise_conv2d, pointwise_conv2d, dense,
    batch_norm_train, batch_norm_inference, max_pool, global_avg_pool,
    softmax_cross_entropy, softmax_probs,
)
from tests import oracles


def nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def nchw(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("stride,padding,fh", [(1, 1, 3), (2, 1, 5), (2, 0, 4), (1, 2, 3)])
def test_conv2d(stride, padding, fh):
    x = np.random.randn(2, 3, 12, 12).astype(np.float32)
    w = np.random.randn(8, 3, fh, fh).astype(np.float32)
    b = np.random.randn(8).astype(np.float32)
    ref = oracles.conv2d_oracle(x, w, b, stride, padding)
    got = nchw(conv2d(nhwc(x), jnp.asarray(w), jnp.asarray(b), stride, padding))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding", [(1, 1), (2, 1), (1, 0)])
def test_depthwise_conv2d(stride, padding):
    x = np.random.randn(2, 6, 11, 11).astype(np.float32)
    w = np.random.randn(6, 3, 3).astype(np.float32)
    b = np.random.randn(6).astype(np.float32)
    ref = oracles.depthwise_conv2d_oracle(x, w, b, stride, padding)
    got = nchw(depthwise_conv2d(nhwc(x), jnp.asarray(w), jnp.asarray(b), stride, padding))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,H", [(1, 8), (2, 8), (2, 7), (3, 11)])
def test_pointwise_conv2d(stride, H):
    # Odd H exercises the reference's subsample-first (ceil) semantics.
    x = np.random.randn(2, 5, H, H).astype(np.float32)
    w = np.random.randn(7, 5).astype(np.float32)
    b = np.random.randn(7).astype(np.float32)
    ref = oracles.pointwise_conv2d_oracle(x, w, b, stride)
    got = nchw(pointwise_conv2d(nhwc(x), jnp.asarray(w), jnp.asarray(b), stride))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dense():
    x = np.random.randn(4, 9).astype(np.float32)
    w = np.random.randn(9, 5).astype(np.float32)
    b = np.random.randn(5).astype(np.float32)
    got = np.asarray(dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, x @ w + b, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [2, 3])
def test_max_pool(stride):
    x = np.random.randn(2, 4, 12, 12).astype(np.float32)
    ref = oracles.max_pool_oracle(x, stride)
    got = nchw(max_pool(nhwc(x), stride))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_global_avg_pool():
    x = np.random.randn(3, 5, 7, 7).astype(np.float32)
    got = np.asarray(global_avg_pool(nhwc(x)))
    np.testing.assert_allclose(got, x.mean(axis=(2, 3)), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("ndim", [2, 4])
def test_batch_norm_train_first_and_ema(ndim):
    shape = (6, 5) if ndim == 2 else (4, 5, 6, 6)
    x1 = np.random.randn(*shape).astype(np.float32)
    x2 = np.random.randn(*shape).astype(np.float32)
    gamma = np.random.rand(5).astype(np.float32) + 0.5
    beta = np.random.randn(5).astype(np.float32)
    bshape = (1, -1, 1, 1) if ndim == 4 else (1, -1)
    g_b, b_b = gamma.reshape(bshape), beta.reshape(bshape)

    # Step 1 (uninitialised): running stats adopt batch stats.
    ref_y1, ref_m1, ref_s1 = oracles.batch_norm_train_oracle(x1, g_b, b_b, None, None)
    x1n = nhwc(x1) if ndim == 4 else jnp.asarray(x1)
    y1, m1, s1 = batch_norm_train(x1n, jnp.asarray(gamma), jnp.asarray(beta),
                                  jnp.zeros(5), jnp.zeros(5), initialized=False)
    y1 = nchw(y1) if ndim == 4 else np.asarray(y1)
    np.testing.assert_allclose(y1, ref_y1, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m1), ref_m1.reshape(-1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), ref_s1.reshape(-1), rtol=1e-5, atol=1e-5)

    # Step 2: EMA with momentum 0.95.
    ref_y2, ref_m2, ref_s2 = oracles.batch_norm_train_oracle(x2, g_b, b_b, ref_m1, ref_s1)
    x2n = nhwc(x2) if ndim == 4 else jnp.asarray(x2)
    y2, m2, s2 = batch_norm_train(x2n, jnp.asarray(gamma), jnp.asarray(beta),
                                  m1, s1, initialized=True)
    y2 = nchw(y2) if ndim == 4 else np.asarray(y2)
    np.testing.assert_allclose(y2, ref_y2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m2), ref_m2.reshape(-1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), ref_s2.reshape(-1), rtol=1e-5, atol=1e-5)

    # Inference normalises by running stats.
    ref_inf = g_b * ((x2 - ref_m2) / ref_s2) + b_b
    got_inf = batch_norm_inference(x2n, jnp.asarray(gamma), jnp.asarray(beta), m2, s2)
    got_inf = nchw(got_inf) if ndim == 4 else np.asarray(got_inf)
    np.testing.assert_allclose(got_inf, ref_inf, rtol=1e-4, atol=1e-4)


def test_softmax_and_loss_one_hot():
    logits = np.random.randn(8, 10).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 8)]
    ref_loss, ref_p, _ = oracles.softmax_xent_oracle(logits, y)
    np.testing.assert_allclose(np.asarray(softmax_probs(jnp.asarray(logits))),
                               ref_p, rtol=1e-5, atol=1e-6)
    got_loss = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
    np.testing.assert_allclose(got_loss, ref_loss, rtol=1e-5)


def test_loss_soft_labels_mixup():
    # Soft labels: the reference reports -log(p.y) — verify we match that value.
    logits = np.random.randn(6, 4).astype(np.float32)
    y1 = np.eye(4, dtype=np.float32)[np.random.randint(0, 4, 6)]
    y2 = np.eye(4, dtype=np.float32)[np.random.randint(0, 4, 6)]
    y = 0.7 * y1 + 0.3 * y2
    ref_loss, _, _ = oracles.softmax_xent_oracle(logits, y)
    got_loss = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
    np.testing.assert_allclose(got_loss, ref_loss, rtol=1e-5)


def test_bf16_compute_path_trains():
    """bfloat16 compute dtype: convs emit bf16 (cast back to fp32), gradients
    flow (the VJP dtype-mismatch regression), numerics near the fp32 path."""
    import jax
    import dorknet_tpu
    from tests.test_network import small_net, toy_batch
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import SGDMomentum

    X, y, one_hot = toy_batch(B=8)
    try:
        dorknet_tpu.set_compute_dtype(jnp.bfloat16)
        net = small_net(seed=21)
        tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
        l0, _ = tr.step(X, one_hot)
        l1 = l0
        for _ in range(10):
            l1, _ = tr.step(X, one_hot)
        assert np.isfinite(float(l1))
        assert float(l1) < float(l0)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)
