"""Reference-compatible stateful layer API: forward/backward side-effect
semantics, grads dicts, BN running-stat mutation, composite residual block."""

import pytest
import numpy as np
import jax.numpy as jnp

from dorknet_tpu.layers import (
    ConvLayer, DepthwiseConvLayer, PointwiseConvLayer, DenseLayer,
    BatchNormLayer, ReLu, GlobalAveragePoolingLayer, MaxPoolLayer,
    ResidualBlock, SoftmaxWithCrossEntropy,
)
from dorknet_tpu.regularisers.l2 import l2
from tests import oracles


def test_conv_layer_forward_backward():
    layer = ConvLayer("c1", filter_block_shape=(4, 3, 3, 3), stride=1, padding=1,
                      with_bias=True, weight_regulariser=l2(0.01))
    x = np.random.randn(2, 3, 8, 8).astype(np.float32)
    y = np.asarray(layer.forward(x))
    w = np.asarray(layer.learned_params["weights"])
    b = np.asarray(layer.learned_params["bias"])
    ref = oracles.conv2d_oracle(x, w, b, 1, 1)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)

    dy = np.random.randn(*y.shape).astype(np.float32)
    dx = np.asarray(layer.backward(dy))
    assert dx.shape == x.shape
    # bias grad = sum over (0,2,3) (reference: layers/convolution.py:92)
    np.testing.assert_allclose(np.asarray(layer.grads["bias"]),
                               dy.sum(axis=(0, 2, 3)), rtol=1e-4, atol=1e-3)
    # weight grad includes the l2 term (reference: layers/convolution.py:99-100)
    layer2 = ConvLayer("c2", filter_block_shape=(4, 3, 3, 3), stride=1, padding=1,
                       with_bias=True)
    layer2.learned_params = dict(layer.learned_params)
    layer2.forward(x)
    layer2.backward(dy)
    np.testing.assert_allclose(np.asarray(layer.grads["weights"]),
                               np.asarray(layer2.grads["weights"]) + 0.01 * w,
                               rtol=1e-4, atol=1e-4)


def test_relu_mask_semantics():
    layer = ReLu("r")
    x = np.array([[-1.0, 0.0, 2.0]], dtype=np.float32)
    y = np.asarray(layer.forward(x))
    np.testing.assert_array_equal(y, [[0.0, 0.0, 2.0]])
    dx = np.asarray(layer.backward(np.ones_like(x)))
    # gradient strictly 0 at x == 0 (mask is out > 0, reference activations.py:34)
    np.testing.assert_array_equal(dx, [[0.0, 0.0, 1.0]])


def test_batch_norm_layer_state_lifecycle():
    layer = BatchNormLayer("bn", input_dimension=4, incoming_chans=3)
    assert layer.non_learned_params["running_mean"] is None
    x1 = np.random.randn(4, 3, 5, 5).astype(np.float32)
    layer.forward(x1)
    rm1 = np.asarray(layer.non_learned_params["running_mean"])
    assert rm1.shape == (1, 3, 1, 1)
    np.testing.assert_allclose(rm1.reshape(-1), x1.mean(axis=(0, 2, 3)),
                               rtol=1e-5, atol=1e-5)
    x2 = np.random.randn(4, 3, 5, 5).astype(np.float32)
    layer.forward(x2)
    rm2 = np.asarray(layer.non_learned_params["running_mean"])
    np.testing.assert_allclose(
        rm2.reshape(-1),
        0.95 * rm1.reshape(-1) + 0.05 * x2.mean(axis=(0, 2, 3)),
        rtol=1e-5, atol=1e-5)
    # test_mode does not mutate state
    layer.forward(x1, test_mode=True)
    np.testing.assert_array_equal(np.asarray(layer.non_learned_params["running_mean"]), rm2)


def test_batch_norm_backward_matches_reference_formula():
    layer = BatchNormLayer("bn", input_dimension=4, incoming_chans=3)
    gamma = (np.random.rand(3) + 0.5).astype(np.float32)
    layer.learned_params["gamma"] = jnp.asarray(gamma.reshape(1, 3, 1, 1))
    x = np.random.randn(4, 3, 5, 5).astype(np.float32)
    layer.forward(x)
    dy = np.random.randn(4, 3, 5, 5).astype(np.float32)
    dx = np.asarray(layer.backward(dy))
    ref = oracles.batch_norm_dx_oracle(x, gamma.reshape(1, 3, 1, 1), dy)
    np.testing.assert_allclose(dx, ref, rtol=1e-3, atol=1e-4)
    assert np.asarray(layer.grads["gamma"]).shape == (1, 3, 1, 1)


def test_maxpool_and_gap_layers():
    mp = MaxPoolLayer("mp", None, stride=2)
    x = np.random.randn(2, 3, 8, 8).astype(np.float32)
    y = np.asarray(mp.forward(x))
    np.testing.assert_allclose(y, oracles.max_pool_oracle(x, 2), rtol=1e-6)
    dy = np.random.randn(*y.shape).astype(np.float32)
    dx = np.asarray(mp.backward(dy))
    assert dx.shape == x.shape
    # gradient mass is conserved per pooling window
    np.testing.assert_allclose(dx.sum(), dy.sum(), rtol=1e-5)

    gap = GlobalAveragePoolingLayer("gap")
    yg = np.asarray(gap.forward(x))
    np.testing.assert_allclose(yg, x.mean(axis=(2, 3)), rtol=1e-5, atol=1e-6)
    dyg = np.random.randn(2, 3).astype(np.float32)
    dxg = np.asarray(gap.backward(dyg))
    np.testing.assert_allclose(dxg, np.broadcast_to(dyg[:, :, None, None] / 64.0, x.shape),
                               rtol=1e-5, atol=1e-7)


def test_loss_layer_api():
    layer = SoftmaxWithCrossEntropy("softmax")
    logits = np.random.randn(4, 6).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[np.random.randint(0, 6, 4)]
    loss, probs = layer.forward(logits, y)
    ref_loss, ref_p, ref_d = oracles.softmax_xent_oracle(logits, y)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), ref_p, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(layer.backward()), ref_d, rtol=1e-5, atol=1e-7)
    zero, probs_t = layer.forward(logits, test_mode=True)
    assert zero == 0
    np.testing.assert_allclose(np.asarray(probs_t), ref_p, rtol=1e-5, atol=1e-6)


def _make_res_block(chans=4, downsample=False):
    inner = [
        DepthwiseConvLayer("dw", filter_block_shape=(chans, 3, 3),
                           stride=2 if downsample else 1, padding=1, with_bias=False),
        BatchNormLayer("dw_bn", incoming_chans=chans),
        PointwiseConvLayer("pw", filter_block_shape=(chans, chans), with_bias=False,
                           weight_regulariser=l2(0.01)),
        BatchNormLayer("pw_bn", incoming_chans=chans),
    ]
    skip = (PointwiseConvLayer("skip", filter_block_shape=(chans, chans), stride=2,
                               with_bias=False, weight_regulariser=l2(0.01))
            if downsample else None)
    return ResidualBlock("res", layer_list=inner, skip_projection=skip,
                         post_skip_activation=ReLu("res_relu"))


def test_residual_block_identity_skip():
    block = _make_res_block(downsample=False)
    x = np.random.randn(2, 4, 6, 6).astype(np.float32)
    y = np.asarray(block.forward(x))
    assert y.shape == x.shape
    assert (y >= 0).all()
    dy = np.random.randn(*y.shape).astype(np.float32)
    dx = np.asarray(block.backward(dy))
    assert dx.shape == x.shape
    # inner grads landed in the children's dicts
    assert np.asarray(block.layer_list[0].grads["weights"]).any()


def test_residual_block_projection_skip_and_reg_accounting():
    block = _make_res_block(downsample=True)
    x = np.random.randn(2, 4, 6, 6).astype(np.float32)
    y = np.asarray(block.forward(x))
    assert y.shape == (2, 4, 3, 3)
    # Reference accounting excludes the skip projection's l2 term
    # (layers/residual_block.py:78-84); full accounting includes it.
    p = block.get_params()
    reported = float(block.reg_loss(p))
    full = float(block.reg_loss_full(p))
    skip_term = 0.5 * 0.01 * float(np.sum(np.square(
        np.asarray(block.skip_projection.learned_params["weights"]))))
    np.testing.assert_allclose(full - reported, skip_term, rtol=1e-5)
    np.testing.assert_allclose(reported, float(block.regulariser_forward()), rtol=1e-6)


def test_residual_block_backward_adds_nested_reg_grads():
    """Standalone block.backward must include the children's AND the skip
    projection's l2 gradients (the reference adds them inside each child's
    backward)."""
    block = _make_res_block(downsample=True)
    x = np.random.randn(2, 4, 6, 6).astype(np.float32)
    block.forward(x)
    # zero upstream gradient isolates the reg terms exactly (no fp32
    # cancellation against the data gradient)
    dy = np.zeros((2, 4, 3, 3), dtype=np.float32)
    block.backward(dy)
    w_pw = np.asarray(block.layer_list[2].learned_params["weights"])
    w_skip = np.asarray(block.skip_projection.learned_params["weights"])
    np.testing.assert_allclose(np.asarray(block.layer_list[2].grads["weights"]),
                               0.01 * w_pw, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(block.skip_projection.grads["weights"]),
                               0.01 * w_skip, rtol=1e-5, atol=1e-8)
    # reg-free children get pure data gradients (zero here)
    np.testing.assert_allclose(np.asarray(block.layer_list[0].grads["weights"]),
                               0.0, atol=1e-8)


def test_repr_strings_match_reference_format():
    """The structure json is a dict of repr strings (reference
    network/feed_forward_network.py:97-104) — formats must match."""
    from dorknet_tpu.layers import DenseLayer, GlobalAveragePoolingLayer
    import numpy as np

    np.random.seed(0)
    c = ConvLayer("conv0", filter_block_shape=(64, 3, 5, 5), stride=2,
                  padding=1, with_bias=False, weight_regulariser=l2(0.0001))
    assert repr(c) == ("ConvLayer(conv0, filter_block_shape=(64,3,5,5), "
                       "stride=2, padding=1, with_bias=False, "
                       "weight_regulariser=l2(strength=0.0001))")
    d = DepthwiseConvLayer("dw", filter_block_shape=(64, 3, 3), stride=1,
                           padding=1, with_bias=False)
    assert repr(d) == ("DepthwiseConvLayer(dw, filter_block_shape=(64, 3, 3), "
                       "stride=1, padding=1, with_bias=False, "
                       "weight_regulariser=None)")
    p = PointwiseConvLayer("pw", filter_block_shape=(64, 64), stride=2,
                           with_bias=False)
    assert repr(p) == ("PointwiseConvLayer(pw, filter_block_shape=(64, 64), "
                       "stride=2, with_bias=False, weight_regulariser=None, "
                       "is_on_gpu=False)")
    b = BatchNormLayer("bn", input_dimension=4, incoming_chans=64)
    assert repr(b) == ("BatchNormLayer(bn, input_dimension=4, "
                       "incoming_chans=64, run_momentum=0.95)")
    assert repr(ReLu("r")) == "ReLu(r)"
    assert repr(GlobalAveragePoolingLayer("g")) == "GlobalAveragePoolingLayer(g)"
    assert repr(SoftmaxWithCrossEntropy("s")) == "SoftmaxWithCrossEntropy(s)"
    dn = DenseLayer("d1", incoming_chans=512, output_dim=120,
                    weight_regulariser=l2(0.0001))
    assert repr(dn) == ("DenseLayer(d1, incoming_chans=512, output_dim=120, "
                        "weight_regulariser=l2(strength=0.0001))")


def test_bn_save_before_first_batch_is_clear_error(tmp_path):
    """Saving a BatchNorm with no running stats yet must raise a clear
    ValueError, not h5py's object-dtype crash."""
    import h5py
    from dorknet_tpu.layers import BatchNormLayer

    bn = BatchNormLayer("b1", incoming_chans=4)
    with h5py.File(str(tmp_path / "x.h5"), "w") as f:
        with pytest.raises(ValueError, match="running statistics"):
            bn.save_to_h5(f)


def test_residual_block_requires_post_skip_activation():
    from dorknet_tpu.layers import ConvLayer, ResidualBlock

    c = ConvLayer("c", filter_block_shape=(4, 4, 3, 3))
    with pytest.raises(ValueError, match="post_skip_activation"):
        ResidualBlock("rb", layer_list=[c])
    # the bare load-path constructor stays legal
    ResidualBlock("rb2")


def test_cam_without_dense_head_is_clear_error():
    from dorknet_tpu.cam import compute_cam_scores
    from dorknet_tpu.network import FeedForwardNetwork
    from dorknet_tpu.layers import (ConvLayer, ReLu,
                                    GlobalAveragePoolingLayer)

    net = FeedForwardNetwork("no-dense")
    net.add_layer(ConvLayer("c1", filter_block_shape=(4, 3, 3, 3)))
    net.add_layer(ReLu("r1"))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    X = np.random.randn(1, 3, 16, 16).astype(np.float32)
    with pytest.raises(ValueError, match="DenseLayer"):
        compute_cam_scores(net, X, top_k=1, terminal_layer_name="r1")
