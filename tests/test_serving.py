"""BatchingServer: dynamic batching over the serving runners — coalescing,
result fidelity, FIFO carry, error isolation, close semantics."""

import threading

import numpy as np
import pytest

from dorknet_tpu.network import (FeedForwardNetwork, Trainer, InferenceRunner,
                                 BatchingServer)
from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                GlobalAveragePoolingLayer, DenseLayer,
                                SoftmaxWithCrossEntropy)
from dorknet_tpu.optimisers import SGDMomentum


def _trained_runner(batch_size=8, classes=4, image=12, fold_bn=True):
    np.random.seed(0)
    net = FeedForwardNetwork("srv")
    net.add_layer(ConvLayer("c1", filter_block_shape=(8, 3, 3, 3),
                            with_bias=False))
    net.add_layer(BatchNormLayer("bn1", incoming_chans=8))
    net.add_layer(ReLu("r1"))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("d1", incoming_chans=8, output_dim=classes))
    net.set_loss_layer(SoftmaxWithCrossEntropy("s"))
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    X = np.random.randn(8, 3, image, image).astype(np.float32)
    yoh = np.eye(classes, dtype=np.float32)[np.random.randint(0, classes, 8)]
    for _ in range(2):
        tr.step(X, yoh)
    return InferenceRunner(net, batch_size=batch_size, fold_bn=fold_bn)


def test_batching_server_results_match_direct_runner():
    runner = _trained_runner()
    rng = np.random.RandomState(1)
    X = rng.randn(6, 3, 12, 12).astype(np.float32)
    direct = runner.predict_probs(X)
    with BatchingServer(runner, max_wait_ms=200) as srv:
        futs = [srv.submit(X[i]) for i in range(6)]
        got = np.stack([f.result(timeout=30) for f in futs])
    np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-6)
    # single-image submissions squeeze to (classes,)
    assert got.shape == direct.shape


def test_batching_server_coalesces_dispatches():
    runner = _trained_runner(batch_size=8)
    rng = np.random.RandomState(2)
    X = rng.randn(8, 3, 12, 12).astype(np.float32)
    srv = BatchingServer(runner, max_wait_ms=500)
    try:
        futs = [srv.submit(X[i]) for i in range(8)]
        for f in futs:
            f.result(timeout=30)
        # 8 singles within one 500 ms window into a b=8 runner: far fewer
        # dispatches than requests (usually 1; allow scheduler slack)
        assert srv.dispatches <= 3, srv.dispatches
        assert srv.rows_served == 8
    finally:
        srv.close()


def test_batching_server_multirow_and_fifo_carry():
    runner = _trained_runner(batch_size=8)
    rng = np.random.RandomState(3)
    A = rng.randn(5, 3, 12, 12).astype(np.float32)
    B = rng.randn(5, 3, 12, 12).astype(np.float32)
    direct = runner.predict_probs(np.concatenate([A, B]))
    with BatchingServer(runner, max_wait_ms=100) as srv:
        fa, fb = srv.submit(A), srv.submit(B)
        got_a, got_b = fa.result(timeout=30), fb.result(timeout=30)
    # 5+5 rows don't fit one b=8 batch: B is carried to a second dispatch,
    # results still exact and in order
    np.testing.assert_allclose(got_a, direct[:5], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_b, direct[5:], rtol=1e-5, atol=1e-6)
    assert got_a.shape == (5, 4)


def test_batching_server_error_isolation_and_close():
    runner = _trained_runner(batch_size=8)
    rng = np.random.RandomState(4)
    good = rng.randn(3, 12, 12).astype(np.float32)
    srv = BatchingServer(runner, max_wait_ms=50)
    try:
        bad = srv.submit(np.zeros((2, 2), np.float32))  # wrong rank
        too_big = srv.submit(np.zeros((9, 3, 12, 12), np.float32))
        ok = srv.submit(good)
        with pytest.raises(ValueError, match=r"\(C,H,W\)"):
            bad.result(timeout=30)
        with pytest.raises(ValueError, match="exceeds the compiled"):
            too_big.result(timeout=30)
        assert ok.result(timeout=30).shape == (4,)  # server survived
        # sync convenience wrapper
        assert srv.predict_probs(good).shape == (4,)
    finally:
        srv.close()
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(good)
    srv.close()  # idempotent


def test_batching_server_mixed_shapes_and_cancel():
    """Requests with different (C,H,W) in one window must each resolve (the
    collector groups by shape and serves them in separate dispatches — a
    naive concatenate would kill the thread); a cancelled future must not
    kill the collector either."""
    runner = _trained_runner(batch_size=8)
    rng = np.random.RandomState(6)
    a = rng.randn(3, 12, 12).astype(np.float32)
    b = rng.randn(3, 16, 16).astype(np.float32)  # different spatial size
    with BatchingServer(runner, max_wait_ms=200) as srv:
        fa = srv.submit(a)
        fb = srv.submit(b)
        ra, rb = fa.result(timeout=30), fb.result(timeout=30)
        assert ra.shape == (4,) and rb.shape == (4,)
        assert srv.dispatches == 2  # one per shape group

        # cancel-before-dispatch: the collector drops it and keeps serving
        fc = srv.submit(a)
        fc.cancel()
        fd = srv.submit(a)
        assert fd.result(timeout=30).shape == (4,)


def test_batching_server_concurrent_callers():
    runner = _trained_runner(batch_size=8)
    rng = np.random.RandomState(5)
    X = rng.randn(16, 3, 12, 12).astype(np.float32)
    direct = runner.predict_probs(X)
    results = [None] * 16
    with BatchingServer(runner, max_wait_ms=100) as srv:
        def worker(i):
            results[i] = srv.submit(X[i]).result(timeout=30)
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    np.testing.assert_allclose(np.stack(results), direct, rtol=1e-5,
                               atol=1e-6)


def test_batching_server_backpressure():
    """max_pending: submit raises OverloadedError once the queue holds that
    many waiting requests; after the collector drains, submit works again."""
    import time
    from dorknet_tpu.network.serving import OverloadedError

    runner = _trained_runner(batch_size=4)
    rng = np.random.RandomState(7)
    x = rng.randn(3, 12, 12).astype(np.float32)
    # long max_wait: the first request parks the collector in its batching
    # window, so subsequent submits pile up in the queue deterministically
    srv = BatchingServer(runner, max_wait_ms=1500, max_pending=2)
    try:
        futs = [srv.submit(x)]
        deadline = time.time() + 10
        raised = False
        while time.time() < deadline and not raised:
            try:
                futs.append(srv.submit(x))
            except OverloadedError:
                raised = True
        assert raised, "never saw backpressure"
        # every accepted request still resolves
        for f in futs:
            assert f.result(timeout=30).shape == (4,)
        # queue drained -> accepting again
        assert srv.submit(x).result(timeout=30).shape == (4,)
    finally:
        srv.close()


def test_export_program_roundtrip(tmp_path):
    """InferenceRunner.export_program -> load_serving_program: the reloaded
    artifact reproduces the runner bit-for-bit with no model code (weights
    and running stats baked in), for the fp32 runner, the BN-folded runner
    and the int8 quantised runner."""
    import jax.numpy as jnp

    from dorknet_tpu.network import (QuantizedInferenceRunner,
                                     load_serving_program)

    runner = _trained_runner(batch_size=4, fold_bn=False)
    net = runner.network
    Xq = np.random.RandomState(5).randn(4, 3, 12, 12).astype(np.float32)

    for fold in (False, True):
        r = InferenceRunner(net, batch_size=4, fold_bn=fold)
        want = r.predict_probs(Xq)
        path = tmp_path / "serve_{}.bin".format(fold)
        blob = r.export_program((12, 12), path=str(path))
        assert path.read_bytes() == blob
        served = load_serving_program(str(path))
        got = np.asarray(served(jnp.asarray(Xq)))
        np.testing.assert_array_equal(got, want)

    qr = QuantizedInferenceRunner(net, batch_size=4)
    qr.calibrate([Xq])
    want = qr.predict_probs(Xq)
    served = load_serving_program(qr.export_program((12, 12)))
    np.testing.assert_array_equal(np.asarray(served(jnp.asarray(Xq))), want)
