"""FeedForwardNetwork end-to-end: the fused jitted step vs the reference
semantics — loss decreases, grads flow, taps work, Trainer == compat path."""

import numpy as np
import jax.numpy as jnp
import pytest

from dorknet_tpu.network import FeedForwardNetwork, Trainer
from dorknet_tpu.layers import (
    ConvLayer, BatchNormLayer, ReLu, GlobalAveragePoolingLayer, DenseLayer,
    SoftmaxWithCrossEntropy, ResidualBlock, DepthwiseConvLayer,
    PointwiseConvLayer, MaxPoolLayer,
)
from dorknet_tpu.regularisers.l2 import l2
from dorknet_tpu.optimisers import SGD, SGDMomentum, RMSProp


def small_net(n_classes=5, seed=0):
    np.random.seed(seed)
    net = FeedForwardNetwork("tiny")
    net.add_layer(ConvLayer("conv1", filter_block_shape=(8, 3, 3, 3),
                            with_bias=False, weight_regulariser=l2(1e-4),
                            weight_initialiser="glorot_uniform"))
    net.add_layer(BatchNormLayer("bn1", incoming_chans=8))
    net.add_layer(ReLu("relu1"))
    net.add_layer(MaxPoolLayer("mp1", None, stride=2))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("dense1", incoming_chans=8, output_dim=n_classes,
                             weight_regulariser=l2(1e-4),
                             weight_initialiser="glorot_uniform"))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))
    return net


def toy_batch(B=16, n_classes=5, seed=1):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, n_classes, B)
    # class-dependent signal so the net can actually learn
    X = rng.randn(B, 3, 8, 8).astype(np.float32) * 0.1
    for i, yi in enumerate(y):
        X[i, yi % 3, :, :] += 1.0 + yi
    one_hot = np.eye(n_classes, dtype=np.float32)[y]
    return X, y, one_hot


def test_forward_backward_update_loop_learns():
    net = small_net()
    opt = SGDMomentum(net, 0.1, 0.9)
    X, y, one_hot = toy_batch()
    losses = []
    for _ in range(30):
        loss, scores = net.forward(X, one_hot)
        net.backward()
        opt.update_weights()
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses
    # grads got distributed into layer dicts
    assert np.asarray(net.layers[0].grads["weights"]).any()


def test_test_mode_and_accuracy_loop():
    net = small_net()
    opt = SGDMomentum(net, 0.1, 0.9)
    X, y, one_hot = toy_batch(B=20)
    for _ in range(40):
        net.forward(X, one_hot)
        net.backward()
        opt.update_weights()

    def gen():
        yield X, y, one_hot

    acc = net.test(gen(), 20, 20)
    assert acc > 0.8
    # test-mode forward returns (0, probs)
    zero, probs = net.forward(X, y_one_hot=None, test_mode=True)
    assert zero == 0
    np.testing.assert_allclose(np.asarray(probs).sum(axis=1), 1.0, rtol=1e-4)


def test_terminal_layer_tap():
    net = small_net()
    X, _, one_hot = toy_batch()
    _, feats = net.forward(X, one_hot, test_mode=False, terminal_layer_name="relu1")
    assert np.asarray(feats).shape == (16, 8, 8, 8)
    # train-mode tap must NOT mutate BN running stats (unlike the reference's
    # CAM side-effect, SURVEY §3.3)
    assert net.layers[1].non_learned_params["running_mean"] is None
    _, feats_t = net.forward(X, one_hot, test_mode=True, terminal_layer_name="conv1")
    assert np.asarray(feats_t).shape == (16, 8, 8, 8)


def test_trainer_fused_step_matches_compat_path():
    X, y, one_hot = toy_batch()

    net_a = small_net(seed=7)
    opt_a = SGDMomentum(net_a, 0.05, 0.9)
    net_b = small_net(seed=7)  # identical init
    opt_b = SGDMomentum(net_b, 0.05, 0.9)
    trainer = Trainer(net_b, opt_b)

    losses_a, losses_b = [], []
    for _ in range(5):
        loss, _ = net_a.forward(X, one_hot)
        net_a.backward()
        opt_a.update_weights()
        losses_a.append(float(loss))
        loss_b, _ = trainer.step(X, one_hot)
        losses_b.append(float(loss_b))

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(net_a.layers[0].learned_params["weights"]),
        np.asarray(net_b.layers[0].learned_params["weights"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(net_a.layers[1].non_learned_params["running_mean"]),
        np.asarray(net_b.layers[1].non_learned_params["running_mean"]),
        rtol=1e-4, atol=1e-6)


def test_resnet_style_network_trains():
    np.random.seed(3)
    net = FeedForwardNetwork("mini-resnet")
    net.add_layer(ConvLayer("conv0", filter_block_shape=(8, 3, 3, 3), stride=1,
                            padding=1, with_bias=False, weight_regulariser=l2(1e-4)))
    net.add_layer(BatchNormLayer("conv0_bn", incoming_chans=8))
    net.add_layer(ReLu("conv0_relu"))
    inner = [
        DepthwiseConvLayer("res_dw", filter_block_shape=(8, 3, 3), stride=2,
                           padding=1, with_bias=False),
        BatchNormLayer("res_dw_bn", incoming_chans=8),
        PointwiseConvLayer("res_pw", filter_block_shape=(16, 8), with_bias=False,
                           weight_regulariser=l2(1e-4)),
        BatchNormLayer("res_pw_bn", incoming_chans=16),
    ]
    skip = PointwiseConvLayer("res_skip", filter_block_shape=(16, 8), stride=2,
                              with_bias=False, weight_regulariser=l2(1e-4))
    net.add_layer(ResidualBlock("res1", layer_list=inner, skip_projection=skip,
                                post_skip_activation=ReLu("res1_relu")))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("dense1", incoming_chans=16, output_dim=4,
                             weight_regulariser=l2(1e-4)))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))

    opt = SGDMomentum(net, 0.05, 0.9)
    trainer = Trainer(net, opt)
    X, y, one_hot = toy_batch(B=12, n_classes=4)
    res = net.layers[3]
    skip_w0 = np.asarray(res.skip_projection.learned_params["weights"]).copy()
    losses = []
    for _ in range(25):
        loss, _ = trainer.step(X, one_hot)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
    # the skip projection's params were updated (fixed-by-design vs the
    # reference, whose optimisers never walk skip_projection —
    # optimisers/base.py docstring)
    skip_w1 = np.asarray(res.skip_projection.learned_params["weights"])
    assert not np.allclose(skip_w0, skip_w1)


def test_no_loss_layer_forward():
    net = FeedForwardNetwork("headless")
    net.add_layer(ConvLayer("c", filter_block_shape=(4, 3, 3, 3), with_bias=True))
    X = np.random.randn(2, 3, 6, 6).astype(np.float32)
    loss, out = net.forward(X, None)
    assert loss == 0
    assert np.asarray(out).shape == (2, 4, 6, 6)


def test_trainer_multi_step_matches_sequential():
    X, y, one_hot = toy_batch(B=8)
    Xs = np.stack([X + 0.01 * i for i in range(4)])
    ys = np.stack([one_hot] * 4)

    net_a = small_net(seed=11)
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    seq_losses = [float(tr_a.step(Xs[i], ys[i])[0]) for i in range(4)]

    net_b = small_net(seed=11)
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9))
    # first call: BN uninitialised -> the all-single-step fallback path
    losses, preds = tr_b.multi_step(Xs, ys)
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-4, atol=1e-6)
    assert np.asarray(preds).shape == (4, 8)
    # second call: BN initialised -> the fused lax.scan program; trajectory
    # must keep matching sequential steps
    seq_losses2 = [float(tr_a.step(Xs[i], ys[i])[0]) for i in range(4)]
    losses2, preds2 = tr_b.multi_step(Xs, ys)
    np.testing.assert_allclose(np.asarray(losses2), seq_losses2,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(net_a.layers[0].learned_params["weights"]),
        np.asarray(net_b.layers[0].learned_params["weights"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(net_a.layers[1].non_learned_params["running_mean"]),
        np.asarray(net_b.layers[1].non_learned_params["running_mean"]),
        rtol=1e-4, atol=1e-6)


def test_trainer_remat_matches_plain():
    X, y, one_hot = toy_batch(B=8)
    net_a = small_net(seed=17)
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    net_b = small_net(seed=17)
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9), remat=True)
    for _ in range(4):
        la, _ = tr_a.step(X, one_hot)
        lb, _ = tr_b.step(X, one_hot)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(net_a.layers[0].learned_params["weights"]),
        np.asarray(net_b.layers[0].learned_params["weights"]), rtol=1e-5, atol=1e-6)


def test_trainer_accumulate_step_matches_big_batch():
    """avg-grad over K micro-batches == one step on the concatenated batch
    (modulo BN batch stats; use a net whose BN sees identical micro-batches)."""
    X, y, one_hot = toy_batch(B=8)
    Xs = np.stack([X, X])          # identical micro-batches -> identical BN stats
    ys = np.stack([one_hot, one_hot])

    net_a = small_net(seed=23)
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    tr_a.step(X, one_hot)  # BN init parity
    la, _ = tr_a.step(X, one_hot)

    net_b = small_net(seed=23)
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9))
    tr_b.step(X, one_hot)
    lb = tr_b.accumulate_step(Xs, ys)

    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(net_a.layers[0].learned_params["weights"]),
        np.asarray(net_b.layers[0].learned_params["weights"]), rtol=1e-5, atol=1e-6)


def test_trainer_accumulate_step_bn_free_distinct_microbatches():
    """For a BN-free net the property users assume holds exactly:
    accumulate_step over K DISTINCT micro-batches == one step on the
    concatenated K*B batch (loss and gradient are both batch means, so
    mean-of-means over equal-sized micro-batches is the big-batch mean)."""
    def bn_free_net(seed):
        np.random.seed(seed)
        net = FeedForwardNetwork("bnfree")
        net.add_layer(ConvLayer("conv1", filter_block_shape=(8, 3, 3, 3),
                                with_bias=True, weight_regulariser=l2(1e-4),
                                weight_initialiser="glorot_uniform"))
        net.add_layer(ReLu("relu1"))
        net.add_layer(GlobalAveragePoolingLayer("gap"))
        net.add_layer(DenseLayer("dense1", incoming_chans=8, output_dim=5,
                                 weight_regulariser=l2(1e-4),
                                 weight_initialiser="glorot_uniform"))
        net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))
        return net

    X1, _, oh1 = toy_batch(B=8, seed=3)
    X2, _, oh2 = toy_batch(B=8, seed=4)
    Xbig = np.concatenate([X1, X2])
    ohbig = np.concatenate([oh1, oh2])

    net_a = bn_free_net(seed=29)
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    la, _ = tr_a.step(Xbig, ohbig)

    net_b = bn_free_net(seed=29)
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9))
    lb = tr_b.accumulate_step(np.stack([X1, X2]), np.stack([oh1, oh2]))

    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for name in ("conv1", "dense1"):
        a = next(l for l in net_a.layers if l.layer_name == name)
        b = next(l for l in net_b.layers if l.layer_name == name)
        for pname in a.learned_params:
            np.testing.assert_allclose(
                np.asarray(a.learned_params[pname]),
                np.asarray(b.learned_params[pname]), rtol=1e-5, atol=1e-6)


def test_inference_runner_padding_and_equivalence():
    from dorknet_tpu.network import InferenceRunner

    net = small_net(seed=41)
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    X, y, one_hot = toy_batch(B=16)
    for _ in range(3):
        tr.step(X, one_hot)

    runner = InferenceRunner(net, batch_size=8)
    # 13 samples: one full batch + one padded partial batch
    probs = runner.predict_probs(X[:13])
    assert probs.shape == (13, 5)
    _, ref = net.forward(X[:13], None, test_mode=True)
    np.testing.assert_allclose(probs, np.asarray(ref), rtol=1e-4, atol=1e-6)
    preds = runner.predict(X[:13])
    np.testing.assert_array_equal(preds, np.asarray(ref).argmax(1))

    # streaming API over loader-style tuples
    batches = [(X[:8], y[:8], one_hot[:8]), (X[8:16], y[8:16], one_hot[8:16])]
    got = list(runner.predict_iter(iter(batches)))
    assert len(got) == 2
    np.testing.assert_allclose(np.concatenate([g[0] for g in got]),
                               np.asarray(net.forward(X, None, test_mode=True)[1]),
                               rtol=1e-4, atol=1e-6)

    # refresh() picks up newly-trained params
    tr.step(X, one_hot)
    stale = runner.predict_probs(X[:4])
    runner.refresh()
    fresh = runner.predict_probs(X[:4])
    assert not np.allclose(stale, fresh)


def test_trainer_nhwc_input_layout():
    X, y, one_hot = toy_batch(B=8)
    net_a = small_net(seed=51)
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    net_b = small_net(seed=51)
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9), input_layout="NHWC")
    X_nhwc = np.transpose(X, (0, 2, 3, 1)).copy()
    for _ in range(3):
        la, _ = tr_a.step(X, one_hot)
        lb, _ = tr_b.step(X_nhwc, one_hot)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)


def test_multi_step_nested_bn_guard():
    """Regression: BN layers nested inside ResidualBlocks must trigger the
    first-step fallback of multi_step (previously only top-level BNs did,
    silently adopting batch stats for all K scanned steps)."""
    np.random.seed(71)
    net = FeedForwardNetwork("nested-bn")
    inner = [
        PointwiseConvLayer("pw", filter_block_shape=(8, 3), with_bias=False),
        BatchNormLayer("pw_bn", incoming_chans=8),
    ]
    skip = PointwiseConvLayer("skip", filter_block_shape=(8, 3), with_bias=False)
    net.add_layer(ResidualBlock("res", layer_list=inner, skip_projection=skip,
                                post_skip_activation=ReLu("relu")))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("d", incoming_chans=8, output_dim=4))
    net.set_loss_layer(SoftmaxWithCrossEntropy("s"))
    assert not net.layers[0].bn_initialized()

    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    X = np.random.randn(2, 6, 3, 5, 5).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[np.random.randint(0, 4, (2, 6))]
    losses, _ = tr.multi_step(X, y)
    assert np.isfinite(np.asarray(losses)).all()

    # after step 1 the nested BN must be EMA-updating, not re-adopting:
    bn = net.layers[0].layer_list[1]
    rm1 = np.asarray(bn.non_learned_params["running_mean"]).copy()
    tr.step(X[0], y[0])
    rm2 = np.asarray(bn.non_learned_params["running_mean"])
    assert not np.allclose(rm1, rm2)
    assert bn.bn_initialized() and net.layers[0].bn_initialized()


def test_seeded_training_is_deterministic():
    """Same seed -> bit-identical params and loss trajectory (host-side init via
    np.random, device compute deterministic under jit)."""
    X, y, one_hot = toy_batch(B=8)

    def run():
        net = small_net(seed=77)
        tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
        losses = [float(tr.step(X, one_hot)[0]) for _ in range(4)]
        return losses, np.asarray(net.layers[0].learned_params["weights"])

    l1, w1 = run()
    l2_, w2 = run()
    assert l1 == l2_
    np.testing.assert_array_equal(w1, w2)


def test_inference_runner_fold_bn():
    from dorknet_tpu.network import InferenceRunner

    net = small_net(seed=81)
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    X, y, one_hot = toy_batch(B=8)
    for _ in range(2):
        tr.step(X, one_hot)
    plain = InferenceRunner(net, batch_size=8)
    folded = InferenceRunner(net, batch_size=8, fold_bn=True)
    np.testing.assert_allclose(folded.predict_probs(X), plain.predict_probs(X),
                               rtol=1e-4, atol=1e-5)


def test_trainer_remat_blocks_matches_plain():
    np.random.seed(3)

    def build():
        np.random.seed(3)
        net = FeedForwardNetwork("rb")
        inner = [PointwiseConvLayer("pw", filter_block_shape=(8, 3), with_bias=False),
                 BatchNormLayer("bn", incoming_chans=8)]
        net.add_layer(ResidualBlock("res", layer_list=inner, skip_projection=None,
                                    post_skip_activation=ReLu("r")))
        net.add_layer(GlobalAveragePoolingLayer("g"))
        net.add_layer(DenseLayer("d", incoming_chans=8, output_dim=4))
        net.set_loss_layer(SoftmaxWithCrossEntropy("s"))
        return net

    # identity skip requires in==out channels: feed 8-channel input? pw maps 3->8,
    # so skip is shape-mismatched — use a projectionless block on 8 channels.
    X = np.random.RandomState(1).randn(6, 3, 5, 5).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[np.random.RandomState(2).randint(0, 4, 6)]

    net_a = build()
    net_b = build()
    # fix the block: identity skip with 3->8 is invalid, so swap to a projection
    for net in (net_a, net_b):
        res = net.layers[0]
        res.skip_projection = PointwiseConvLayer("skip", filter_block_shape=(8, 3),
                                                 with_bias=False)
    # copy (not alias) so net_a's donated buffers don't invalidate net_b's
    net_b.layers[0].skip_projection.learned_params["weights"] = jnp.asarray(
        np.array(net_a.layers[0].skip_projection.learned_params["weights"]))

    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9), remat="blocks")
    for _ in range(3):
        la, _ = tr_a.step(X, y)
        lb, _ = tr_b.step(X, y)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)


def test_remat_bf16_trains():
    """Regression: remat + bf16 compute hit an XLA:TPU mixed-precision
    reduce_sum in the bias-grad transpose until the bias add accumulated its
    cotangent in fp32 (ops/conv._bias_add)."""
    import jax.numpy as jnp
    import dorknet_tpu

    X, y, one_hot = toy_batch(B=8)
    try:
        dorknet_tpu.set_compute_dtype(jnp.bfloat16)
        net = small_net(seed=97)
        # use a bias-carrying dense layer (small_net's dense has bias)
        tr = Trainer(net, SGDMomentum(net, 0.05, 0.9), remat=True)
        l0, _ = tr.step(X, one_hot)
        for _ in range(6):
            l1, _ = tr.step(X, one_hot)
        assert np.isfinite(float(l1)) and float(l1) < float(l0)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)


def test_config_flip_retraces_not_stale():
    """Confirmed bug before the fix: jit caches keyed only on structure
    reused the fp32 trace after set_compute_dtype(bfloat16). The SAME network
    object must now produce the same outputs as a fresh network under the
    new policy."""
    import jax.numpy as jnp
    import dorknet_tpu

    X, y, one_hot = toy_batch(B=8)
    net = small_net(seed=31)
    # train-mode forwards: BN uses batch stats, so outputs are
    # state-independent and comparable across objects
    _, probs_fp32 = net.forward(X, one_hot)

    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        _, probs_bf16 = net.forward(X, one_hot)  # same object, new policy
        fresh = small_net(seed=31)
        _, probs_fresh = fresh.forward(X, one_hot)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)
    # the flipped-policy run matches a fresh bf16 network bit-for-bit...
    np.testing.assert_array_equal(np.asarray(probs_bf16),
                                  np.asarray(probs_fresh))
    # ...and genuinely differs from the fp32 trace's output
    assert np.abs(np.asarray(probs_bf16) - np.asarray(probs_fp32)).max() > 0


def test_optimiser_swap_resets_state():
    """Swapping trainer.optimiser mid-run must NOT feed the old optimiser's
    cache (e.g. momentum velocities) to the new one as its state."""
    import jax
    from dorknet_tpu.optimisers import RMSProp

    X, y, one_hot = toy_batch(B=8)

    net_a = small_net(seed=33)
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    for _ in range(2):
        tr_a.step(X, one_hot)
    snapshot = [jax.tree_util.tree_map(np.asarray, l.get_params())
                for l in net_a.layers]

    # reference: a FRESH RMSProp trainer from the snapshot
    net_b = small_net(seed=33)
    for l, p in zip(net_b.layers, snapshot):
        l.set_params(jax.tree_util.tree_map(jnp.asarray, p))
    net_b.scatter_states([l.get_state() for l in net_a.layers])
    tr_b = Trainer(net_b, RMSProp(net_b, 0.01, 0.9))
    tr_b.step(X, one_hot)

    # swap on the live trainer: must match the fresh-RMSProp trajectory
    tr_a.optimiser = RMSProp(net_a, 0.01, 0.9)
    tr_a.step(X, one_hot)
    np.testing.assert_allclose(
        np.asarray(net_a.layers[0].learned_params["weights"]),
        np.asarray(net_b.layers[0].learned_params["weights"]),
        rtol=1e-5, atol=1e-6)


def test_unknown_terminal_layer_name_is_clear_error():
    import pytest

    X, y, one_hot = toy_batch(B=4)
    net = small_net(seed=35)
    with pytest.raises(ValueError, match="matches no layer"):
        net.forward(X, None, test_mode=True, terminal_layer_name="typo")


def test_test_mode_tap_requires_bn_init():
    """forward(test_mode=True, terminal_layer_name=...) must hit the same
    BN-initialisation guard as the plain test-mode branch — it used to return
    silently-NaN feature maps (divide by the zero running-std placeholder)."""
    import pytest
    from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                    GlobalAveragePoolingLayer, DenseLayer)

    np.random.seed(0)
    net = FeedForwardNetwork("tap-guard")
    net.add_layer(ConvLayer("c", filter_block_shape=(8, 3, 3, 3),
                            with_bias=False))
    net.add_layer(BatchNormLayer("b", incoming_chans=8))
    net.add_layer(ReLu("feat"))
    net.add_layer(GlobalAveragePoolingLayer("g"))
    net.add_layer(DenseLayer("d", incoming_chans=8, output_dim=4))
    X = np.random.randn(2, 3, 8, 8).astype(np.float32)
    with pytest.raises(ValueError, match="running statistics"):
        net.forward(X, None, test_mode=True, terminal_layer_name="feat")
    # train-mode tap (batch statistics) still works pre-init
    _, feats = net.forward(X, None, test_mode=False, terminal_layer_name="feat")
    assert np.isfinite(np.asarray(feats)).all()


def test_inference_runner_policy_flip_retraces():
    """A compute-policy flip after an InferenceRunner is built must retrace
    the serving program, not silently serve the stale-trace numerics (same
    contract as every trace_signature-keyed cache)."""
    import jax.numpy as jnp
    import dorknet_tpu
    from dorknet_tpu.network import InferenceRunner, Trainer
    from dorknet_tpu.optimisers import SGDMomentum
    from dorknet_tpu.models import MNISTNet

    np.random.seed(0)
    net = MNISTNet("flip")
    X = np.random.randn(8, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 8)]
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    for _ in range(4):
        tr.step(X, y)

    r = InferenceRunner(net, batch_size=8)
    p_fp32 = r.predict_probs(X)
    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        p_flip = r.predict_probs(X)          # same runner, flipped policy
        fresh = InferenceRunner(net, batch_size=8)
        p_fresh = fresh.predict_probs(X)     # built natively under bf16
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)
    np.testing.assert_array_equal(p_flip, p_fresh)  # retraced, not stale
    assert np.abs(p_flip - p_fp32).max() > 0  # bf16 numerics really applied
    p_back = r.predict_probs(X)              # and back to fp32
    np.testing.assert_array_equal(p_back, p_fp32)


def test_trainer_clip_norm_semantics():
    """clip_norm rescales the gradient tree to the global-L2 budget inside
    the fused step: with a tiny budget the first update equals the unclipped
    gradient direction scaled to exactly clip_norm; with a huge budget the
    step is identical to an unclipped trainer. Also applies in multi_step."""
    import jax

    def build(seed):
        np.random.seed(seed)
        net = FeedForwardNetwork("clip")
        net.add_layer(DenseLayer("d1", incoming_chans=6, output_dim=4))
        net.set_loss_layer(SoftmaxWithCrossEntropy("s"))
        return net

    rng = np.random.RandomState(0)
    X = (10.0 * rng.randn(16, 6)).astype(np.float32)  # big grads
    y = np.eye(4, dtype=np.float32)[rng.randint(0, 4, 16)]
    lr = 1.0

    def first_update(clip):
        net = build(3)
        p0 = [np.asarray(v) for v in
              jax.tree_util.tree_leaves(net.gather_params())]
        tr = Trainer(net, SGD(net, lr), clip_norm=clip)
        tr.step(X, y)
        p1 = [np.asarray(v) for v in
              jax.tree_util.tree_leaves(net.gather_params())]
        return [a - b for a, b in zip(p1, p0)]

    d_none = first_update(None)
    d_huge = first_update(1e9)
    d_tiny = first_update(0.01)

    # huge budget == no clipping, bit-for-bit direction
    for a, b in zip(d_none, d_huge):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    # tiny budget: update = -lr * g * (clip/||g||) -> ||update|| == lr*clip
    norm_tiny = np.sqrt(sum(float((d ** 2).sum()) for d in d_tiny))
    np.testing.assert_allclose(norm_tiny, lr * 0.01, rtol=1e-4)
    norm_none = np.sqrt(sum(float((d ** 2).sum()) for d in d_none))
    assert norm_none > 10 * norm_tiny  # clipping actually engaged
    # direction preserved (global rescale, not per-leaf)
    for a, b in zip(d_none, d_tiny):
        np.testing.assert_allclose(a / norm_none, b / norm_tiny,
                                   rtol=1e-3, atol=1e-6)

    # multi_step path traces the clip too
    net = build(3)
    tr = Trainer(net, SGD(net, lr), clip_norm=0.01)
    Xs = np.stack([X, X]); ys = np.stack([y, y])
    losses, _ = tr.multi_step(Xs, ys)
    assert np.isfinite(np.asarray(losses)).all()

    with pytest.raises(ValueError, match="clip_norm"):
        Trainer(build(3), SGD(build(3), lr), clip_norm=-1.0)
