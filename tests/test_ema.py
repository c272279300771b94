"""EMA-of-weights maintained inside the fused train-step programs
(Trainer(ema_decay=...) — a production-serving addition the reference lacks;
the shadow update is traced into the SAME XLA program as the step, costing
zero extra dispatches)."""

import numpy as np
import pytest

import jax

from dorknet_tpu.models import MNISTNet
from dorknet_tpu.network import Trainer, InferenceRunner
from dorknet_tpu.optimisers import SGDMomentum


def _data(B=16, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(B, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[rng.randint(0, 10, B)]
    return X, y


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def test_ema_matches_manual_recurrence():
    """After k steps, shadow == the hand-computed EMA over the param
    trajectory (init = params at step 1's input)."""
    X, y = _data()
    d = 0.9
    net = MNISTNet("ema-manual")
    tr = Trainer(net, SGDMomentum(net, 0.01, 0.9), ema_decay=d)

    manual = None
    for k in range(4):
        params_before = [l.get_params() for l in net.layers]
        if manual is None:
            manual = jax.tree_util.tree_map(np.asarray, params_before)
        tr.step(X, y)
        params_after = jax.tree_util.tree_map(
            np.asarray, [l.get_params() for l in net.layers])
        manual = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * p, manual, params_after)

    for e_got, e_want in zip(_leaves(tr.ema_params()), _leaves(manual)):
        np.testing.assert_allclose(np.asarray(e_got), e_want, rtol=2e-5,
                                   atol=1e-6)


def test_ema_decay_zero_tracks_params_exactly():
    X, y = _data()
    net = MNISTNet("ema-zero")
    tr = Trainer(net, SGDMomentum(net, 0.01, 0.9), ema_decay=0.0)
    for _ in range(3):
        tr.step(X, y)
    live = [l.get_params() for l in net.layers]
    for e, p in zip(_leaves(tr.ema_params()), _leaves(live)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p), rtol=1e-6)


@pytest.mark.slow
def test_ema_multi_step_and_accumulate():
    """multi_step (lax.scan of K steps) must advance the shadow K times —
    trajectory-identical to K individual steps."""
    X, y = _data()
    Xs = np.stack([X, X + 0.01, X - 0.01])
    ys = np.stack([y, y, y])

    np.random.seed(7)
    net_a = MNISTNet("ema-single")
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.01, 0.9), ema_decay=0.9)
    for i in range(3):
        tr_a.step(Xs[i], ys[i])

    np.random.seed(7)
    net_b = MNISTNet("ema-multi")
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.01, 0.9), ema_decay=0.9)
    tr_b.multi_step(Xs, ys)

    for ea, eb in zip(_leaves(tr_a.ema_params()), _leaves(tr_b.ema_params())):
        np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), rtol=2e-5,
                                   atol=1e-6)

    # accumulate_step also advances the shadow (by ONE update)
    net_c = MNISTNet("ema-accum")
    tr_c = Trainer(net_c, SGDMomentum(net_c, 0.01, 0.9), ema_decay=0.9)
    tr_c.accumulate_step(Xs, ys)
    assert tr_c.ema_params() is not None


def test_ema_network_serves_and_survives_donation():
    """ema_network() yields a servable copy whose buffers survive further
    training (the live shadow is donated in-place each step)."""
    X, y = _data()
    net = MNISTNet("ema-serve")
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9), ema_decay=0.5)
    for _ in range(3):
        tr.step(X, y)

    served = tr.ema_network()
    r = InferenceRunner(served, batch_size=16)
    probs_before = r.predict_probs(X)
    assert probs_before.shape == (16, 10)

    # EMA weights differ from the live weights (decay keeps history)
    live = [l.get_params() for l in net.layers]
    diffs = [np.abs(np.asarray(e) - np.asarray(p)).max()
             for e, p in zip(_leaves(tr.ema_params()), _leaves(live))]
    assert max(diffs) > 0

    # keep training: the served copy must still be usable (no donated buffers)
    for _ in range(2):
        tr.step(X, y)
    probs_after = r.predict_probs(X)
    np.testing.assert_allclose(probs_before, probs_after, rtol=1e-6)


def test_ema_network_composes_with_quantized_serving():
    """The intended production serving recipe: int8-quantise the EMA copy."""
    from dorknet_tpu.network import QuantizedInferenceRunner

    X, y = _data()
    net = MNISTNet("ema-q")
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9), ema_decay=0.9)
    for _ in range(3):
        tr.step(X, y)
    served = tr.ema_network()
    fp = InferenceRunner(served, batch_size=16, fold_bn=True)
    q = QuantizedInferenceRunner(served, batch_size=16)
    q.calibrate([X])
    p_fp, p_q = fp.predict_probs(X), q.predict_probs(X)
    assert (p_fp.argmax(1) == p_q.argmax(1)).mean() == 1.0


def test_no_ema_by_default():
    X, y = _data()
    net = MNISTNet("ema-off")
    tr = Trainer(net, SGDMomentum(net, 0.01, 0.9))
    tr.step(X, y)
    assert tr.ema_params() is None
