"""Self-contained serving-stack demo — no dataset needed.

Trains a small convnet on a synthetic colour task (with an EMA of the
weights maintained inside the fused train step), then walks the production
serving ladder and reports latency/agreement for each rung:

  1. plain test-mode forward            (the reference's serving story)
  2. InferenceRunner                    (fixed-shape compiled batches)
  3. InferenceRunner(fold_bn=True)      (conv<-BN folding)
  4. QuantizedInferenceRunner           (int8 MXU, calibrated scales)
  5. ...serving the EMA weights         (trainer.ema_network())
  6. BatchingServer                     (dynamic batching front-end)
  7. export_program / load_serving_program (portable serving artifact)

Run:  python -m examples.serving_demo

Timing note (PERF.md): on hosts behind a slow accelerator link the wall
latency is dispatch-dominated; the numbers here use a value fetch as the
sync and report best-of-trials.
"""

import time

import numpy as np

from dorknet_tpu.network import (FeedForwardNetwork, Trainer, InferenceRunner,
                                 QuantizedInferenceRunner)
from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                GlobalAveragePoolingLayer, DenseLayer,
                                SoftmaxWithCrossEntropy)
from dorknet_tpu.optimisers import SGDMomentum


def make_batch(rng, B=64, size=32, classes=4):
    y = rng.randint(0, classes, B)
    X = rng.randn(B, 3, size, size).astype(np.float32) * 10.0
    X += 30.0 * y[:, None, None, None]  # channel-intensity signal
    return X, np.eye(classes, dtype=np.float32)[y], y


def build_net(classes=4):
    net = FeedForwardNetwork("serving-demo")
    net.add_layer(ConvLayer("c1", filter_block_shape=(16, 3, 3, 3),
                            with_bias=False,
                            weight_initialiser="glorot_uniform"))
    net.add_layer(BatchNormLayer("b1", incoming_chans=16))
    net.add_layer(ReLu("r1"))
    net.add_layer(ConvLayer("c2", filter_block_shape=(32, 16, 3, 3), stride=2,
                            with_bias=False,
                            weight_initialiser="glorot_uniform"))
    net.add_layer(BatchNormLayer("b2", incoming_chans=32))
    net.add_layer(ReLu("r2"))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("d1", incoming_chans=32, output_dim=classes,
                             weight_initialiser="glorot_uniform"))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))
    return net


def time_server(tag, predict, X, ref_top1=None, trials=5):
    probs = predict(X)  # compile + sync outside the timed window
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        probs = predict(X)
        float(np.asarray(probs)[0, 0])  # value fetch = true sync
        best = min(best, time.perf_counter() - t0)
    top1 = np.asarray(probs).argmax(axis=1)
    agree = "" if ref_top1 is None else \
        "  top-1 agreement {:.3f}".format((top1 == ref_top1).mean())
    print("{:38s} {:7.2f} ms/batch{}".format(tag, best * 1e3, agree))
    return top1


def main(steps=60):
    rng = np.random.RandomState(0)
    np.random.seed(0)
    net = build_net()
    # ema_decay scales with run length: the shadow keeps decay^steps of the
    # INITIAL weights, so a 60-step demo wants 0.9 (0.9^60 ~ 0.2%); real runs
    # with thousands of steps use 0.999-ish
    trainer = Trainer(net, SGDMomentum(net, 0.05, 0.9), ema_decay=0.9)
    for i in range(steps):
        X, oh, _ = make_batch(rng)
        loss, _ = trainer.step(X, oh)
    print("trained {} steps, final loss {:.3f}\n".format(steps, float(loss)))

    X_eval, _, y_eval = make_batch(rng, B=64)
    print("batch=64 serving ladder (best-of-5, value-fetch synced):")
    ref = time_server("net.forward(test_mode=True)",
                      lambda X: net.forward(X, test_mode=True)[1], X_eval)
    print("  eval accuracy: {:.3f}".format((ref == y_eval).mean()))

    r = InferenceRunner(net, batch_size=64)
    time_server("InferenceRunner", r.predict_probs, X_eval, ref)

    rf = InferenceRunner(net, batch_size=64, fold_bn=True)
    time_server("InferenceRunner(fold_bn)", rf.predict_probs, X_eval, ref)

    q = QuantizedInferenceRunner(net, batch_size=64)
    Xc, _, _ = make_batch(rng, B=64)
    q.calibrate([Xc])
    time_server("QuantizedInferenceRunner(int8)", q.predict_probs, X_eval, ref)
    print("  calibrated scales persist as {} floats "
          "(get_scales/set_scales)".format(len(q.get_scales())))

    ema_net = trainer.ema_network()
    re = InferenceRunner(ema_net, batch_size=64, fold_bn=True)
    ema_top1 = time_server("EMA weights + fold_bn", re.predict_probs,
                           X_eval, ref)
    print("  EMA eval accuracy: {:.3f}".format((ema_top1 == y_eval).mean()))

    # 6) deployment front-end: concurrent single-image callers coalesced
    # into the one compiled batch shape (BatchingServer)
    from dorknet_tpu.network import BatchingServer

    with BatchingServer(rf, max_wait_ms=100) as srv:
        futs = [srv.submit(X_eval[i]) for i in range(64)]
        batched = np.stack([f.result(timeout=60) for f in futs])
        print("BatchingServer: 64 concurrent singles -> {} device "
              "dispatch(es); top-1 agreement with plain forward: {:.3f}"
              .format(srv.dispatches, (batched.argmax(1) == ref).mean()))

    # 7) deployment artifact: the compiled serving program serialized with
    # the weights baked in — reloads with jax alone, no model code
    import tempfile

    import jax.numpy as jnp
    from dorknet_tpu.network import load_serving_program

    with tempfile.NamedTemporaryFile(suffix=".serving") as f:
        blob = rf.export_program(X_eval.shape[2:], path=f.name)
        served = load_serving_program(f.name)
        exported = np.asarray(served(jnp.asarray(X_eval, jnp.float32)))
        print("export_program: {} KB artifact; reloaded top-1 agreement "
              "with the runner it serialized: {:.3f}".format(
                  len(blob) // 1024,
                  (exported.argmax(1) == rf.predict(X_eval)).mean()))

    # 8. polymorphic-batch artifact + the full-service wrapper: one file
    #    serves EVERY batch size, predict_probs pads/chunks like the runner
    from dorknet_tpu.network import load_serving_artifact

    art = load_serving_artifact(
        rf.export_program(X_eval.shape[2:], polymorphic_batch=True))
    sizes = [1, 7, 64]
    agree = [(art.predict(X_eval[:n]) == rf.predict(X_eval[:n])).mean()
             for n in sizes]
    print("polymorphic artifact: batches {} -> top-1 agreement {}".format(
        sizes, [round(float(a), 3) for a in agree]))


if __name__ == "__main__":
    main()
