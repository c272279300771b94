"""Real-data accuracy integration: a small convnet of this framework must reach
high accuracy on sklearn's 8x8 digits — the end-to-end learning-quality oracle
standing in for the reference's MNIST-accuracy methodology (SURVEY §4: the
reference establishes correctness by training-accuracy, not unit tests).

Run under both fp32 (the parity default) and bf16 (the recommended
production policy, PERF.md): bf16 must land within ~1% of fp32 accuracy."""

import numpy as np
import pytest

import dorknet_tpu
from dorknet_tpu.network import FeedForwardNetwork, Trainer
from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                GlobalAveragePoolingLayer, DenseLayer,
                                SoftmaxWithCrossEntropy)
from dorknet_tpu.regularisers.l2 import l2
from dorknet_tpu.optimisers import SGDMomentum

_ACC_CACHE = {}


def _digits_data():
    from sklearn.datasets import load_digits

    d = load_digits()
    X = (d.images[:, None, :, :] / 16.0).astype(np.float32)  # (N,1,8,8)
    y = d.target.astype(np.int32)
    rng = np.random.RandomState(0)
    perm = rng.permutation(len(y))
    X, y = X[perm], y[perm]
    return X[:1500], y[:1500], X[1500:], y[1500:]


def _train_digits(dtype_name):
    """Train the digits convnet under the given compute-dtype policy and
    return final test accuracy (cached per dtype — both parity tests reuse
    the same runs)."""
    if dtype_name in _ACC_CACHE:
        return _ACC_CACHE[dtype_name]

    import jax.numpy as jnp

    X_train, y_train, X_test, y_test = _digits_data()
    eye = np.eye(10, dtype=np.float32)

    dorknet_tpu.set_compute_dtype(
        jnp.bfloat16 if dtype_name == "bf16" else jnp.float32)
    try:
        np.random.seed(0)
        net = FeedForwardNetwork("digits_" + dtype_name)
        net.add_layer(ConvLayer("c1", filter_block_shape=(16, 1, 3, 3),
                                with_bias=False, weight_regulariser=l2(1e-4),
                                weight_initialiser="glorot_uniform"))
        net.add_layer(BatchNormLayer("b1", incoming_chans=16))
        net.add_layer(ReLu("r1"))
        net.add_layer(ConvLayer("c2", filter_block_shape=(32, 16, 3, 3),
                                stride=2, with_bias=False,
                                weight_regulariser=l2(1e-4),
                                weight_initialiser="glorot_uniform"))
        net.add_layer(BatchNormLayer("b2", incoming_chans=32))
        net.add_layer(ReLu("r2"))
        net.add_layer(GlobalAveragePoolingLayer("gap"))
        net.add_layer(DenseLayer("d1", incoming_chans=32, output_dim=10,
                                 weight_regulariser=l2(5e-4),
                                 weight_initialiser="glorot_uniform"))
        net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))

        opt = SGDMomentum(net, 0.1, 0.9)
        trainer = Trainer(net, opt)
        B = 100
        for epoch in range(12):
            idx = np.random.permutation(len(y_train))
            for i in range(0, len(y_train) - B + 1, B):
                sel = idx[i:i + B]
                trainer.step(X_train[sel], eye[y_train[sel]])

        def gen():
            for i in range(0, 297 - 99 + 1, 99):
                yield X_test[i:i + 99], y_test[i:i + 99], eye[y_test[i:i + 99]]

        acc = net.test(gen(), 99, 297)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)

    _ACC_CACHE[dtype_name] = acc
    return acc


def test_digits_convnet_accuracy():
    acc = _train_digits("fp32")
    assert acc > 0.9, acc


def test_digits_convnet_accuracy_bf16_parity():
    """bf16 is the recommended production policy; its converged accuracy
    must sit within ~1% of fp32 on the same task, seed, and schedule."""
    acc_fp32 = _train_digits("fp32")
    acc_bf16 = _train_digits("bf16")
    assert acc_bf16 > 0.9, acc_bf16
    assert abs(acc_fp32 - acc_bf16) < 0.015, (acc_fp32, acc_bf16)
