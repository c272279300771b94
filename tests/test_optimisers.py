"""Optimiser update formulas vs manual NumPy (reference formulas, SURVEY §2.4)."""

import numpy as np
import jax.numpy as jnp

from dorknet_tpu.network import FeedForwardNetwork
from dorknet_tpu.layers import DenseLayer, SoftmaxWithCrossEntropy
from dorknet_tpu.optimisers import SGD, SGDMomentum, RMSProp


def _net_with_known_grads(seed=0):
    np.random.seed(seed)
    net = FeedForwardNetwork("opt-test")
    net.add_layer(DenseLayer("d1", incoming_chans=6, output_dim=4))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))
    X = np.random.randn(8, 6).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[np.random.randint(0, 4, 8)]
    net.forward(X, y)
    net.backward()
    return net


def test_sgd_formula():
    net = _net_with_known_grads()
    layer = net.layers[0]
    w0 = np.asarray(layer.learned_params["weights"]).copy()
    g = np.asarray(layer.grads["weights"]).copy()
    opt = SGD(net, 0.1)
    opt.update_weights()
    np.testing.assert_allclose(np.asarray(layer.learned_params["weights"]),
                               w0 - 0.1 * g, rtol=1e-5, atol=1e-7)


def test_sgd_momentum_formula_two_steps():
    net = _net_with_known_grads()
    layer = net.layers[0]
    opt = SGDMomentum(net, 0.1, 0.9)

    w0 = np.asarray(layer.learned_params["weights"]).copy()
    g1 = np.asarray(layer.grads["weights"]).copy()
    opt.update_weights()
    dx1 = -0.1 * g1
    np.testing.assert_allclose(np.asarray(layer.learned_params["weights"]),
                               w0 + dx1, rtol=1e-5, atol=1e-7)

    # second step: dx = -lr*g + m*v (reference SGDMomentum.py:31-39)
    X = np.random.randn(8, 6).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[np.random.randint(0, 4, 8)]
    net.forward(X, y)
    net.backward()
    g2 = np.asarray(layer.grads["weights"]).copy()
    w1 = np.asarray(layer.learned_params["weights"]).copy()
    opt.update_weights()
    dx2 = -0.1 * g2 + 0.9 * dx1
    np.testing.assert_allclose(np.asarray(layer.learned_params["weights"]),
                               w1 + dx2, rtol=1e-5, atol=1e-6)


def test_rmsprop_formula():
    net = _net_with_known_grads()
    layer = net.layers[0]
    opt = RMSProp(net, 0.01, 0.9)
    w0 = np.asarray(layer.learned_params["weights"]).copy()
    g = np.asarray(layer.grads["weights"]).copy()
    opt.update_weights()
    c = (1 - 0.9) * g ** 2
    expected = w0 - 0.01 * g / np.sqrt(c + 1e-5)
    np.testing.assert_allclose(np.asarray(layer.learned_params["weights"]),
                               expected, rtol=1e-4, atol=1e-6)


def test_learning_rate_setters():
    net = _net_with_known_grads()
    opt = SGDMomentum(net, 0.1, 0.9)
    opt.set_learning_rate(0.05)
    assert opt.learning_rate == 0.05
    opt.multiply_learning_rate(0.5)
    assert abs(opt.learning_rate - 0.025) < 1e-12


def test_optax_adapter_adamw_in_fused_trainer():
    import optax
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import OptaxOptimiser
    from tests.test_network import small_net, toy_batch

    X, y, one_hot = toy_batch(B=8)
    net = small_net(seed=13)
    tx = optax.inject_hyperparams(lambda lr: optax.adamw(lr))(lr=1e-2)
    opt = OptaxOptimiser(net, tx, learning_rate=1e-2)
    tr = Trainer(net, opt)
    l0, _ = tr.step(X, one_hot)
    for _ in range(15):
        l1, _ = tr.step(X, one_hot)
    assert float(l1) < float(l0)
    # schedule change threads through without retrace errors
    opt.multiply_learning_rate(0.1)
    l2_, _ = tr.step(X, one_hot)
    assert np.isfinite(float(l2_))


def test_optax_adapter_compat_path():
    import optax
    from dorknet_tpu.optimisers import OptaxOptimiser
    from tests.test_network import small_net, toy_batch

    X, y, one_hot = toy_batch(B=8)
    net = small_net(seed=14)
    opt = OptaxOptimiser(net, optax.sgd(0.05), learning_rate=0.05)
    l0 = None
    for _ in range(10):
        loss, _ = net.forward(X, one_hot)
        net.backward()
        opt.update_weights()
        l0 = float(loss) if l0 is None else l0
    assert float(loss) < l0


def test_optax_adapter_respects_transformation_lr():
    """Regression: default learning_rate=None must NOT zero the lr configured
    inside an inject_hyperparams transformation (previously froze training)."""
    import optax
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import OptaxOptimiser
    from tests.test_network import small_net, toy_batch

    X, y, one_hot = toy_batch(B=8)
    net = small_net(seed=15)
    w0 = np.asarray(net.layers[0].learned_params["weights"]).copy()
    tx = optax.inject_hyperparams(lambda lr: optax.sgd(lr))(lr=0.1)
    opt = OptaxOptimiser(net, tx)  # no learning_rate passed
    tr = Trainer(net, opt)
    for _ in range(3):
        tr.step(X, one_hot)
    w1 = np.asarray(net.layers[0].learned_params["weights"])
    assert np.abs(w1 - w0).max() > 1e-4  # params actually moved


def test_momentum_mutation_retraces():
    """Hyperparameters baked into the traced update (momentum, decay_rate)
    must take effect when mutated mid-run — the jit caches key on
    Optimiser.hyper_key(), so opt.momentum = x retraces instead of silently
    keeping the old constant."""
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import SGDMomentum
    from tests.test_network import small_net, toy_batch

    X, y, one_hot = toy_batch(B=8)

    def run(schedule):
        np.random.seed(21)
        net = small_net(seed=21)
        opt = SGDMomentum(net, 0.05, schedule[0])
        tr = Trainer(net, opt)
        for m in schedule:
            opt.momentum = m
            tr.step(X, one_hot)
        return np.asarray(net.layers[0].learned_params["weights"])

    # same steps, momentum flipped mid-run vs held — trajectories must differ
    w_flip = run([0.9, 0.9, 0.0])
    w_hold = run([0.9, 0.9, 0.9])
    assert np.abs(w_flip - w_hold).max() > 1e-6

    # and the flipped run must equal a run that started a fresh optimiser at
    # the flip (same math, proving the new constant is really in the program)
    def run_fresh_flip():
        np.random.seed(21)
        net = small_net(seed=21)
        opt = SGDMomentum(net, 0.05, 0.9)
        tr = Trainer(net, opt)
        tr.step(X, one_hot)
        tr.step(X, one_hot)
        opt.momentum = 0.0
        tr.step(X, one_hot)
        return np.asarray(net.layers[0].learned_params["weights"])

    np.testing.assert_allclose(w_flip, run_fresh_flip(), rtol=1e-6)


def test_optax_adapter_swap_retraces():
    """Two OptaxOptimiser instances can share class name AND state treedef
    while baking different hyperparameters — swapping one in must retrace the
    fused step, not silently keep the old update rule (instance-keyed
    hyper_key)."""
    import optax
    from dorknet_tpu.models import MNISTNet
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import OptaxOptimiser

    np.random.seed(0)
    net = MNISTNet("optax-swap")
    X = np.random.randn(4, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 4)]

    tr = Trainer(net, OptaxOptimiser(net, optax.sgd(0.1)))
    tr.step(X, y)
    tr.step(X, y)
    before = np.asarray(net.layers[0].learned_params["weights"]).copy()

    tr.optimiser = OptaxOptimiser(net, optax.sgd(0.0))  # same treedef, lr 0
    tr.step(X, y)
    after = np.asarray(net.layers[0].learned_params["weights"])
    np.testing.assert_array_equal(before, after)  # lr=0 really applied


def test_optimiser_refreshes_layers_after_structure_change():
    """An optimiser built BEFORE layers exist (or before a checkpoint load)
    must pick up the new layers — the stale construction-time snapshot used
    to make update_weights() a silent no-op."""
    from dorknet_tpu.network import FeedForwardNetwork
    from dorknet_tpu.layers import DenseLayer, SoftmaxWithCrossEntropy
    from dorknet_tpu.optimisers import SGD

    np.random.seed(0)
    net = FeedForwardNetwork("late-layers")
    opt = SGD(net, 0.5)  # constructed against ZERO layers
    net.add_layer(DenseLayer("d", incoming_chans=4, output_dim=3))
    net.set_loss_layer(SoftmaxWithCrossEntropy("s"))

    X = np.random.randn(8, 4).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[np.random.randint(0, 3, 8)]
    before = np.asarray(net.layers[0].learned_params["weights"]).copy()
    net.forward(X, y)
    net.backward()
    opt.update_weights()
    after = np.asarray(net.layers[0].learned_params["weights"])
    assert np.abs(after - before).max() > 0  # the late layer really updated
