"""Fused augmentation+training (Trainer.step_augmented / multi_step_augmented):
the device_augment pipeline traced INTO the train-step program — one dispatch
per step (or per K steps), uint8 uploads, no HBM round-trip for the augmented
batch. Must be numerically identical to running train_pipeline(...) and then
step(...) as two programs (reference behaviour: host-thread augmentation in
image_data_loader.py:97-112 feeding the train loop)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dorknet_tpu.data_loading.device_augment import train_pipeline
from dorknet_tpu.layers import (BatchNormLayer, ConvLayer, DenseLayer,
                                GlobalAveragePoolingLayer, ReLu,
                                SoftmaxWithCrossEntropy)
from dorknet_tpu.network import FeedForwardNetwork, Trainer
from dorknet_tpu.optimisers import SGDMomentum
from dorknet_tpu.regularisers.l2 import l2

AUG = dict(hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
           rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
           crop_mode="random", mixup=(0.0, 0.3))
OUT = (24, 24)


def build_net(name):
    np.random.seed(7)
    net = FeedForwardNetwork(name)
    net.add_layer(ConvLayer("conv0", filter_block_shape=(8, 3, 3, 3),
                            with_bias=False, weight_regulariser=l2(1e-4)))
    net.add_layer(BatchNormLayer("bn0", incoming_chans=8))
    net.add_layer(ReLu("relu0"))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("dense1", incoming_chans=8, output_dim=3,
                             weight_regulariser=l2(1e-4)))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))
    return net


def _batch(B=6, precrop=30, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randint(0, 255, (B, precrop, precrop, 3), dtype=np.uint8)
    oh = np.eye(3, dtype=np.float32)[rng.randint(0, 3, B)]
    return X, oh


def _params(net):
    return jax.tree_util.tree_map(np.asarray,
                                  [l.get_params() for l in net.layers])


def test_step_augmented_equals_two_program_path():
    """Same key, same raw batch: fused aug+train == train_pipeline then a
    NHWC-layout step, for losses AND the full param trajectory."""
    net_a, net_b = build_net("fused"), build_net("two-prog")
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9), input_layout="NHWC")

    key = jax.random.PRNGKey(3)
    for i in range(3):
        key, k = jax.random.split(key)
        X, oh = _batch(seed=i)
        loss_a, preds_a = tr_a.step_augmented(k, X, oh, OUT, **AUG)
        Xb, ohb = train_pipeline(k, jnp.asarray(X), jnp.asarray(oh), OUT,
                                 output_layout="NHWC", **AUG)
        loss_b, preds_b = tr_b.step(Xb, ohb)
        assert np.allclose(float(loss_a), float(loss_b), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(preds_a), np.asarray(preds_b))

    for pa, pb in zip(jax.tree_util.tree_leaves(_params(net_a)),
                      jax.tree_util.tree_leaves(_params(net_b))):
        np.testing.assert_allclose(pa, pb, rtol=2e-5, atol=1e-6)


def test_step_augmented_mixup_doubles_batch():
    net = build_net("fused-2x")
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    X, oh = _batch(B=5)
    _, preds = tr.step_augmented(jax.random.PRNGKey(0), X, oh, OUT, **AUG)
    assert preds.shape == (10,)  # both convex orderings trained
    aug_no_mix = dict(AUG, mixup=None)
    _, preds = tr.step_augmented(jax.random.PRNGKey(0), X, oh, OUT,
                                 **aug_no_mix)
    assert preds.shape == (5,)


def test_multi_step_augmented_equals_sequential():
    """One K-step scan dispatch == K sequential fused steps (post-BN-init;
    the fresh-net call itself exercises the single-step fallback)."""
    K, B = 3, 6
    net_a, net_b = build_net("mk"), build_net("seq")
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9))

    keys0 = jax.random.split(jax.random.PRNGKey(11), K)
    Xs = np.stack([_batch(B=B, seed=i)[0] for i in range(K)])
    ys = np.stack([_batch(B=B, seed=i)[1] for i in range(K)])

    # fresh-net call: BN uninitialised -> fallback path, losses still returned
    losses_a, _ = tr_a.multi_step_augmented(keys0, Xs, ys, OUT, **AUG)
    assert losses_a.shape == (K,)
    for i in range(K):
        li, _ = tr_b.step_augmented(keys0[i], Xs[i], ys[i], OUT, **AUG)
        np.testing.assert_allclose(float(losses_a[i]), float(li),
                                   rtol=1e-5, atol=1e-6)

    # steady state: the real one-dispatch scan vs sequential steps
    keys1 = jax.random.split(jax.random.PRNGKey(12), K)
    losses_a, _ = tr_a.multi_step_augmented(keys1, Xs, ys, OUT, **AUG)
    for i in range(K):
        li, _ = tr_b.step_augmented(keys1[i], Xs[i], ys[i], OUT, **AUG)
        np.testing.assert_allclose(float(losses_a[i]), float(li),
                                   rtol=1e-5, atol=1e-6)
    for pa, pb in zip(jax.tree_util.tree_leaves(_params(net_a)),
                      jax.tree_util.tree_leaves(_params(net_b))):
        np.testing.assert_allclose(pa, pb, rtol=2e-5, atol=1e-6)


def test_step_augmented_learns_colour_task():
    """End-to-end sanity: the fused path optimises a GAP-survivable colour
    task (class signal in channel intensity, never spatial position)."""
    rng = np.random.RandomState(0)
    B, precrop = 24, 30
    X = rng.randint(0, 60, (B, precrop, precrop, 3), dtype=np.uint8)
    labels = rng.randint(0, 3, B)
    for i, c in enumerate(labels):
        X[i, :, :, c] = rng.randint(180, 255, (precrop, precrop),
                                    dtype=np.uint8)
    oh = np.eye(3, dtype=np.float32)[labels]

    net = build_net("fused-learn")
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    key = jax.random.PRNGKey(0)
    first = None
    aug = dict(AUG, mixup=None)  # keep labels hard for the loss check
    for i in range(30):
        key, k = jax.random.split(key)
        loss, _ = tr.step_augmented(k, X, oh, OUT, **aug)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5


def test_step_augmented_bf16_policy_matches_two_program_path():
    """Under the production bf16 compute policy the fused step still equals
    the two-program path (same aug_dtype resolution both sides), and the
    policy flip retraces rather than reusing the fp32 program."""
    import dorknet_tpu

    net_a, net_b = build_net("f-bf16"), build_net("t-bf16")
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9), input_layout="NHWC")
    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        key = jax.random.PRNGKey(21)
        for i in range(2):
            key, k = jax.random.split(key)
            X, oh = _batch(seed=i)
            loss_a, _ = tr_a.step_augmented(k, X, oh, OUT, **AUG)
            Xb, ohb = train_pipeline(k, jnp.asarray(X), jnp.asarray(oh), OUT,
                                     output_layout="NHWC", **AUG)
            loss_b, _ = tr_b.step(Xb, ohb)
            assert np.isfinite(float(loss_a))
            # bf16 flow: identical math modulo fusion-order rounding
            assert np.allclose(float(loss_a), float(loss_b),
                               rtol=2e-2, atol=1e-3)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)
    # back under fp32 the SAME trainer must retrace (policy is in the key),
    # not reuse the bf16 program
    X, oh = _batch(seed=9)
    loss, _ = tr_a.step_augmented(jax.random.PRNGKey(0), X, oh, OUT, **AUG)
    assert np.asarray(loss).dtype == np.float32


def test_step_augmented_sharded_matches_single_device():
    """The fused step under a DP mesh equals the single-device fused step
    (global-jit semantics: cross-replica BN + grad all-reduce from the
    sharding alone; the SPMD-safe dw rule engages automatically)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    bs = NamedSharding(mesh, P("data"))

    net_s, net_1 = build_net("dp"), build_net("one")
    tr_s = Trainer(net_s, SGDMomentum(net_s, 0.05, 0.9), batch_sharding=bs)
    tr_1 = Trainer(net_1, SGDMomentum(net_1, 0.05, 0.9))

    key = jax.random.PRNGKey(5)
    for i in range(2):
        key, k = jax.random.split(key)
        X, oh = _batch(B=8, seed=i)
        ls, _ = tr_s.step_augmented(k, X, oh, OUT, **AUG)
        l1, _ = tr_1.step_augmented(k, X, oh, OUT, **AUG)
        np.testing.assert_allclose(float(ls), float(l1), rtol=1e-5, atol=1e-6)
    for pa, pb in zip(jax.tree_util.tree_leaves(_params(net_s)),
                      jax.tree_util.tree_leaves(_params(net_1))):
        np.testing.assert_allclose(pa, pb, rtol=2e-5, atol=1e-6)
