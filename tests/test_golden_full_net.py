"""Golden full-network numerics: the entire jitted training forward (conv→BN→
relu→depthwise→pointwise→maxpool→GAP→dense→softmax-CE with l2 terms) vs a
pure-NumPy composition of the reference-formula oracles. This is the
integration-level analogue of the per-op tests — any layout/ordering slip
between layers shows up here."""

import numpy as np
import jax.numpy as jnp

from dorknet_tpu.network import FeedForwardNetwork
from dorknet_tpu.layers import (
    ConvLayer, BatchNormLayer, ReLu, DepthwiseConvLayer, PointwiseConvLayer,
    MaxPoolLayer, GlobalAveragePoolingLayer, DenseLayer, SoftmaxWithCrossEntropy,
)
from dorknet_tpu.regularisers.l2 import l2
from tests import oracles


def test_full_net_forward_matches_oracle_chain():
    np.random.seed(42)
    net = FeedForwardNetwork("golden")
    net.add_layer(ConvLayer("conv", filter_block_shape=(8, 3, 3, 3), stride=1,
                            padding=1, with_bias=True, weight_regulariser=l2(0.01)))
    net.add_layer(BatchNormLayer("bn", incoming_chans=8))
    net.add_layer(ReLu("relu"))
    net.add_layer(DepthwiseConvLayer("dw", filter_block_shape=(8, 3, 3),
                                     stride=1, padding=1, with_bias=False))
    net.add_layer(PointwiseConvLayer("pw", filter_block_shape=(12, 8),
                                     stride=2, with_bias=True))
    net.add_layer(MaxPoolLayer("mp", None, stride=2))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("dense", incoming_chans=12, output_dim=5,
                             with_bias=True, weight_regulariser=l2(0.02)))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))

    B = 4
    X = np.random.randn(B, 3, 12, 12).astype(np.float32)
    y = np.eye(5, dtype=np.float32)[np.random.randint(0, 5, B)]

    # ---- oracle chain (reference formulas, NCHW NumPy) ----
    P = {l.layer_name: {k: np.asarray(v) for k, v in l.get_params().items()}
         for l in net.layers}
    h = oracles.conv2d_oracle(X, P["conv"]["weights"], P["conv"]["bias"], 1, 1)
    h, rm, rs = oracles.batch_norm_train_oracle(
        h, np.ones((1, 8, 1, 1), np.float32), np.zeros((1, 8, 1, 1), np.float32),
        None, None)
    h = np.maximum(h, 0)
    h = oracles.depthwise_conv2d_oracle(h, P["dw"]["weights"], None, 1, 1)
    h = oracles.pointwise_conv2d_oracle(h, P["pw"]["weights"], P["pw"]["bias"], 2)
    h = oracles.max_pool_oracle(h, 2)
    h = h.mean(axis=(2, 3))
    logits = h @ P["dense"]["weights"] + P["dense"]["bias"]
    ref_data_loss, ref_probs, _ = oracles.softmax_xent_oracle(logits, y)
    reg = (0.5 * 0.01 * np.sum(P["conv"]["weights"] ** 2)
           + 0.5 * 0.02 * np.sum(P["dense"]["weights"] ** 2))
    ref_loss = ref_data_loss + reg

    # ---- framework: one jitted train forward ----
    loss, probs = net.forward(X, y)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(probs), ref_probs, rtol=1e-3, atol=1e-5)

    # BN running stats adopted the oracle's batch stats
    np.testing.assert_allclose(
        np.asarray(net.layers[1].non_learned_params["running_mean"]), rm,
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(net.layers[1].non_learned_params["running_std"]), rs,
        rtol=1e-4, atol=1e-5)

    # test-mode path (running stats + softmax scores, loss 0)
    zero, probs_t = net.forward(X, None, test_mode=True)
    assert zero == 0
    h2 = oracles.conv2d_oracle(X, P["conv"]["weights"], P["conv"]["bias"], 1, 1)
    h2 = (h2 - rm) / rs
    h2 = np.maximum(h2, 0)
    h2 = oracles.depthwise_conv2d_oracle(h2, P["dw"]["weights"], None, 1, 1)
    h2 = oracles.pointwise_conv2d_oracle(h2, P["pw"]["weights"], P["pw"]["bias"], 2)
    h2 = oracles.max_pool_oracle(h2, 2)
    h2 = h2.mean(axis=(2, 3))
    logits2 = h2 @ P["dense"]["weights"] + P["dense"]["bias"]
    ref_probs_t = oracles.softmax_oracle(logits2)
    np.testing.assert_allclose(np.asarray(probs_t), ref_probs_t, rtol=1e-3, atol=1e-5)
