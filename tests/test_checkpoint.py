"""Checkpoint round-trips in the reference's h5+json byte format (SURVEY §3.4)."""

import json

import pytest
import os

import h5py
import numpy as np

from dorknet_tpu.network import FeedForwardNetwork
from dorknet_tpu.layers import (
    ConvLayer, BatchNormLayer, ReLu, GlobalAveragePoolingLayer, DenseLayer,
    SoftmaxWithCrossEntropy, ResidualBlock, DepthwiseConvLayer,
    PointwiseConvLayer,
)
from dorknet_tpu.regularisers.l2 import l2
from dorknet_tpu.optimisers import SGDMomentum


def build_net(seed=0):
    np.random.seed(seed)
    net = FeedForwardNetwork("ckpt-test")
    net.add_layer(ConvLayer("conv0", filter_block_shape=(8, 3, 3, 3), stride=2,
                            padding=1, with_bias=False, weight_regulariser=l2(1e-4)))
    net.add_layer(BatchNormLayer("conv0_bn", incoming_chans=8))
    net.add_layer(ReLu("conv0_relu"))
    inner = [
        DepthwiseConvLayer("res1_dw", filter_block_shape=(8, 3, 3), stride=2,
                           padding=1, with_bias=False),
        BatchNormLayer("res1_dw_bn", incoming_chans=8),
        PointwiseConvLayer("res1_pw", filter_block_shape=(16, 8), with_bias=False,
                           weight_regulariser=l2(1e-4)),
        BatchNormLayer("res1_pw_bn", incoming_chans=16),
    ]
    skip = PointwiseConvLayer("res1_skip", filter_block_shape=(16, 8), stride=2,
                              with_bias=False, weight_regulariser=l2(1e-4))
    net.add_layer(ResidualBlock("res1", layer_list=inner, skip_projection=skip,
                                post_skip_activation=ReLu("res1_relu")))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("dense1", incoming_chans=16, output_dim=5,
                             weight_regulariser=l2(1e-4)))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))
    return net


def train_a_little(net, steps=3):
    opt = SGDMomentum(net, 0.05, 0.9)
    X = np.random.randn(6, 3, 16, 16).astype(np.float32)
    y = np.eye(5, dtype=np.float32)[np.random.randint(0, 5, 6)]
    for _ in range(steps):
        net.forward(X, y)
        net.backward()
        opt.update_weights()
    return X, y


def test_round_trip(tmp_path):
    net = build_net()
    X, y = train_a_little(net)
    h5f = str(tmp_path / "net.h5")
    jsf = str(tmp_path / "net.json")
    net.save_weights_to_h5(h5f)
    net.save_layer_structure_to_json(jsf)

    net2 = FeedForwardNetwork("")
    net2.load_network_from_json_and_h5(jsf, h5f)
    assert net2.name == "ckpt-test"
    assert [l.layer_name for l in net2.layers] == [l.layer_name for l in net.layers]
    assert isinstance(net2.loss_layer, SoftmaxWithCrossEntropy)

    # identical inference
    _, p1 = net.forward(X, None, test_mode=True)
    _, p2 = net2.forward(X, None, test_mode=True)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-6)

    # params, grads, BN running stats all survived
    c1, c2 = net.layers[0], net2.layers[0]
    np.testing.assert_array_equal(np.asarray(c1.learned_params["weights"]),
                                  np.asarray(c2.learned_params["weights"]))
    np.testing.assert_array_equal(np.asarray(c1.grads["weights"]),
                                  np.asarray(c2.grads["weights"]))
    b1, b2 = net.layers[1], net2.layers[1]
    np.testing.assert_array_equal(np.asarray(b1.non_learned_params["running_std"]),
                                  np.asarray(b2.non_learned_params["running_std"]))
    # regulariser reconstructed from attrs
    assert net2.layers[0].weight_regulariser is not None
    assert abs(net2.layers[0].weight_regulariser.strength - 1e-4) < 1e-12
    # residual block children reconstructed with types + skip + activation
    r2 = net2.layers[3]
    assert isinstance(r2, ResidualBlock)
    assert [type(l).__name__ for l in r2.layer_list] == [
        "DepthwiseConvLayer", "BatchNormLayer", "PointwiseConvLayer", "BatchNormLayer"]
    assert isinstance(r2.skip_projection, PointwiseConvLayer)
    assert r2.skip_projection.stride == 2
    assert isinstance(r2.post_skip_activation, ReLu)

    # training continues identically from the restored net
    opt1 = SGDMomentum(net, 0.05, 0.9)
    opt2 = SGDMomentum(net2, 0.05, 0.9)
    l1, _ = net.forward(X, y)
    net.backward(); opt1.update_weights()
    l2_, _ = net2.forward(X, y)
    net2.backward(); opt2.update_weights()
    np.testing.assert_allclose(float(l1), float(l2_), rtol=1e-6)


def test_h5_schema_matches_reference_layout(tmp_path):
    """Byte-format details the reference reader depends on (SURVEY §3.4)."""
    net = build_net()
    train_a_little(net, steps=1)
    h5f = str(tmp_path / "net.h5")
    net.save_weights_to_h5(h5f)
    with h5py.File(h5f, "r") as f:
        assert f["conv0/layer_info"].attrs["type"] == "ConvLayer"
        assert int(f["conv0/layer_info"].attrs["num_filters"]) == 8
        assert f["conv0/weights"].shape == (8, 3, 3, 3)
        assert f["conv0/weights"].dtype == np.float32
        assert f["conv0/grads/weights"].shape == (8, 3, 3, 3)
        # regulariser attrs are byte strings, like the reference's np.string_
        assert f["conv0/weights"].attrs["weight_regulariser_type"] == b"l2"
        assert float(f["conv0/weights"].attrs["weight_regulariser_strength"]) == 1e-4
        # BN stores broadcast-shaped stats
        assert f["conv0_bn/gamma"].shape == (1, 8, 1, 1)
        assert f["conv0_bn/running_std"].shape == (1, 8, 1, 1)
        assert float(f["conv0_bn/layer_info"].attrs["run_momentum"]) == 0.95
        # residual block structure attrs
        attrs = f["res1/layer_info"].attrs
        assert list(attrs["layer_type_list"]) == [
            "DepthwiseConvLayer", "BatchNormLayer", "PointwiseConvLayer", "BatchNormLayer"]
        assert attrs["skip_projection_type"] == "PointwiseConvLayer"
        assert attrs["post_skip_activation_name"] == "res1_relu"
        # children are saved flat at the file root
        assert "res1_dw/weights" in f
        assert "res1_skip/weights" in f


def test_structure_json(tmp_path):
    net = build_net()
    jsf = str(tmp_path / "net.json")
    net.save_layer_structure_to_json(jsf)
    with open(jsf) as f:
        d = json.load(f)
    assert d["name"] == "ckpt-test"
    # order preserved, reprs present
    keys = list(d.keys())
    assert keys[1] == "conv0" and keys[-1] == "softmax"
    assert d["conv0"].startswith("ConvLayer(conv0, filter_block_shape=(8,3,3,3)")
    assert d["softmax"] == "SoftmaxWithCrossEntropy(softmax)"


def test_unknown_layer_type_raises_helpfully(tmp_path):
    import h5py
    from dorknet_tpu.utils import h5io

    h5f = str(tmp_path / "bad.h5")
    jsf = str(tmp_path / "bad.json")
    with h5py.File(h5f, "w") as f:
        h5io.create_layer_info(f, "mystery", "FancyNewLayer")
    with open(jsf, "w") as f:
        json.dump({"name": "x", "mystery": "FancyNewLayer(mystery)"}, f)
    net = FeedForwardNetwork("")
    with pytest.raises(KeyError, match="FancyNewLayer"):
        net.load_network_from_json_and_h5(jsf, h5f)
