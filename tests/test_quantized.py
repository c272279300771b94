"""int8 post-training-quantised serving path (network/quantized.py).

The reference has no quantised inference; this is a TPU-first extension (int8
MXU at 2x bf16 peak, half the HBM traffic). Correctness is pinned against the
fp32 BN-folded InferenceRunner: per-channel int8 weights + per-tensor
activation scales must preserve top-1 decisions and probabilities on both a
plain convnet and the flagship's residual/depthwise/strided-pointwise
structure, under dynamic AND calibrated-static activation scales.
"""

import numpy as np
import pytest

import dorknet_tpu
from dorknet_tpu.network import FeedForwardNetwork, Trainer
from dorknet_tpu.network.inference import InferenceRunner
from dorknet_tpu.network.quantized import (QuantizedInferenceRunner,
                                           _quantize_weight)
from dorknet_tpu.optimisers import SGDMomentum


def _trained(net, X, y, steps=3, lr=0.01):
    tr = Trainer(net, SGDMomentum(net, lr, 0.9))
    for _ in range(steps):
        tr.step(X, y)
    return net


def test_weight_quantization_per_channel():
    w = np.random.RandomState(0).randn(8, 4, 3, 3).astype(np.float32)
    w[3] *= 100.0  # one hot channel must not wreck the others' resolution
    wq, scale = _quantize_weight("ConvLayer", w)
    assert wq.dtype == np.int8 and scale.shape == (8,)
    recon = wq.astype(np.float32) * scale[:, None, None, None]
    err = np.abs(recon - w).max(axis=(1, 2, 3))
    # per-channel: each channel's error bounded by its OWN half-step
    assert np.all(err <= scale * 0.5 + 1e-6)


def test_quantized_matches_fp32_mnistnet():
    from dorknet_tpu.models import MNISTNet

    np.random.seed(0)
    X = np.random.randn(16, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 16)]
    net = _trained(MNISTNet("q-mnist"), X, y)

    fp = InferenceRunner(net, batch_size=16, fold_bn=True)
    q = QuantizedInferenceRunner(net, batch_size=16)
    p_fp, p_q = fp.predict_probs(X), q.predict_probs(X)
    assert (p_fp.argmax(1) == p_q.argmax(1)).mean() == 1.0
    assert np.abs(p_fp - p_q).max() < 0.05

    # static calibration must not change decisions (scales recorded on the
    # same data the dynamic path derived them from)
    n = q.calibrate([X])
    assert n > 0
    p_qs = q.predict_probs(X)
    assert (p_fp.argmax(1) == p_qs.argmax(1)).mean() == 1.0
    assert np.abs(p_fp - p_qs).max() < 0.05


def test_quantized_flagship_residual_structure():
    """ResNet-18-depsep: residual blocks with depthwise convs and strided
    pointwise skip projections all quantise; recursion + calibration walk
    order must agree."""
    from dorknet_tpu.models import ResNet18

    np.random.seed(0)
    X = np.random.randn(4, 3, 64, 64).astype(np.float32)
    y = np.eye(12, dtype=np.float32)[np.random.randint(0, 12, 4)]
    net = _trained(ResNet18("q-flagship", num_classes=12), X, y,
                   steps=2, lr=0.001)

    fp = InferenceRunner(net, batch_size=4, fold_bn=True)
    q = QuantizedInferenceRunner(net, batch_size=4)
    p_fp, p_q = fp.predict_probs(X), q.predict_probs(X)
    assert (p_fp.argmax(1) == p_q.argmax(1)).mean() == 1.0
    assert np.abs(p_fp - p_q).max() < 0.05

    q.calibrate([X])
    p_qs = q.predict_probs(X)
    assert (p_fp.argmax(1) == p_qs.argmax(1)).mean() == 1.0
    assert np.abs(p_fp - p_qs).max() < 0.05

    # full quantisation (incl. the depthwise layers, off by default) must
    # also track fp32 — it's the all-int8 option and covers the depthwise
    # int8 kernel + its calibration walk
    from dorknet_tpu.network.quantized import _QUANT_KINDS

    q_all = QuantizedInferenceRunner(net, batch_size=4,
                                     quant_kinds=_QUANT_KINDS)
    q_all.calibrate([X])
    p_all = q_all.predict_probs(X)
    assert (p_fp.argmax(1) == p_all.argmax(1)).mean() == 1.0
    # 0.08: the bound is seed-sensitive through the 2-step training (observed
    # 0.059 -> 0.064 when the depthwise dw rule's reduction order changed);
    # the decision-agreement assert above is the real gate
    assert np.abs(p_fp - p_all).max() < 0.08


def test_weight_only_depthwise_quantization():
    """weight_only_kinds=("DepthwiseConvLayer",): dw weights stored int8 +
    per-channel scales, compute in flow dtype — the measured serving policy
    (PERF.md round-4 int8-depthwise A/B). Error vs the fp32 server must be
    weight-rounding-small, i.e. strictly tighter than full-int8-dw, and the
    dw nodes must contribute no activation scale."""
    from dorknet_tpu.models import ResNet18
    from dorknet_tpu.network.quantized import _QUANT_KINDS

    np.random.seed(0)
    X = np.random.randn(4, 3, 64, 64).astype(np.float32)
    y = np.eye(12, dtype=np.float32)[np.random.randint(0, 12, 4)]
    net = _trained(ResNet18("q-wonly", num_classes=12), X, y,
                   steps=2, lr=0.001)

    fp = InferenceRunner(net, batch_size=4, fold_bn=True)
    q = QuantizedInferenceRunner(net, batch_size=4)  # dw in flow dtype
    q_w = QuantizedInferenceRunner(
        net, batch_size=4, weight_only_kinds=("DepthwiseConvLayer",))
    q_all = QuantizedInferenceRunner(net, batch_size=4,
                                     quant_kinds=_QUANT_KINDS)

    # same number of activation scales as the default policy (weight-only
    # nodes are invisible to calibration); full-int8 has strictly more
    assert len(q_w.get_scales()) == len(q.get_scales())
    assert len(q_all.get_scales()) > len(q_w.get_scales())

    p_fp = fp.predict_probs(X)
    p_w = q_w.predict_probs(X)
    assert (p_fp.argmax(1) == p_w.argmax(1)).mean() == 1.0
    # dw weight rounding on top of the default policy's error budget
    assert np.abs(p_fp - p_w).max() < 0.06

    # the calibrated scale set transfers across policies with the same
    # quant_kinds (the production set_scales flow)
    q.calibrate([X])
    q_w.set_scales(q.get_scales())
    p_ws = q_w.predict_probs(X)
    assert (p_fp.argmax(1) == p_ws.argmax(1)).mean() == 1.0

    # int8 weights really are in the program (not folded to fp at build)
    import jax
    import jax.numpy as jnp

    txt = jax.jit(q_w._fn).lower(q_w._params, None,
                                 jnp.asarray(X)).as_text()
    assert "xi8>" in txt


def test_quantized_int8_compute_in_graph():
    """The lowered HLO must actually contain s8 operands — i.e. the path is
    int8 compute, not fp emulation."""
    import jax
    import jax.numpy as jnp
    from dorknet_tpu.models import MNISTNet

    np.random.seed(0)
    X = np.random.randn(4, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 4)]
    net = _trained(MNISTNet("q-hlo"), X, y, steps=1)
    q = QuantizedInferenceRunner(net, batch_size=4)
    txt = jax.jit(q._fn).lower(q._params, None, jnp.asarray(X)).as_text()
    assert "xi8>" in txt  # StableHLO spells int8 tensors tensor<...xi8>


def test_quantized_digits_accuracy_parity():
    """End-to-end learning-quality oracle: on sklearn digits, int8 serving
    accuracy within 2% of the fp32 server, top-1 agreement >= 97%."""
    from sklearn.datasets import load_digits
    from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                    GlobalAveragePoolingLayer, DenseLayer,
                                    SoftmaxWithCrossEntropy)
    from dorknet_tpu.regularisers.l2 import l2

    d = load_digits()
    Xall = (d.images[:, None, :, :] / 16.0).astype(np.float32)
    yall = d.target.astype(np.int32)
    rng = np.random.RandomState(0)
    perm = rng.permutation(len(yall))
    Xall, yall = Xall[perm], yall[perm]
    X_train, y_train = Xall[:1200], yall[:1200]
    X_test, y_test = Xall[1200:1500], yall[1200:1500]
    eye = np.eye(10, dtype=np.float32)

    np.random.seed(0)
    net = FeedForwardNetwork("digits_q")
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

    tr = Trainer(net, SGDMomentum(net, 0.1, 0.9))
    B = 100
    for epoch in range(8):
        idx = np.random.permutation(len(y_train))
        for i in range(0, len(y_train) - B + 1, B):
            sel = idx[i:i + B]
            tr.step(X_train[sel], eye[y_train[sel]])

    fp = InferenceRunner(net, batch_size=100, fold_bn=True)
    q = QuantizedInferenceRunner(net, batch_size=100)
    q.calibrate([X_train[i:i + 100] for i in range(0, 300, 100)])

    p_fp, p_q = fp.predict_probs(X_test), q.predict_probs(X_test)
    acc_fp = (p_fp.argmax(1) == y_test).mean()
    acc_q = (p_q.argmax(1) == y_test).mean()
    agree = (p_fp.argmax(1) == p_q.argmax(1)).mean()
    assert acc_fp > 0.8, acc_fp
    assert abs(acc_fp - acc_q) <= 0.02, (acc_fp, acc_q)
    assert agree >= 0.97, agree


def test_percentile_calibration_outlier_robust():
    """VERDICT r2 item 7: an outlier-heavy calibration set (one corrupted
    image per batch with extreme hot pixels) inflates abs-max static scales
    and wrecks served accuracy; percentile calibration shrugs it off —
    accuracy stays within 1% of the fp32 server. Scales still persist via
    get_scales()/set_scales()."""
    from sklearn.datasets import load_digits
    from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                    GlobalAveragePoolingLayer, DenseLayer,
                                    SoftmaxWithCrossEntropy)
    from dorknet_tpu.regularisers.l2 import l2

    d = load_digits()
    Xall = (d.images[:, None, :, :] / 16.0).astype(np.float32)
    yall = d.target.astype(np.int32)
    rng = np.random.RandomState(0)
    perm = rng.permutation(len(yall))
    Xall, yall = Xall[perm], yall[perm]
    X_train, y_train = Xall[:1200], yall[:1200]
    X_test, y_test = Xall[1200:1500], yall[1200:1500]
    eye = np.eye(10, dtype=np.float32)

    np.random.seed(0)
    net = FeedForwardNetwork("digits_pctq")
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

    tr = Trainer(net, SGDMomentum(net, 0.1, 0.9))
    B = 100
    for epoch in range(8):
        idx = np.random.permutation(len(y_train))
        for i in range(0, len(y_train) - B + 1, B):
            sel = idx[i:i + B]
            tr.step(X_train[sel], eye[y_train[sel]])

    fp = InferenceRunner(net, batch_size=100, fold_bn=True)
    acc_fp = (fp.predict_probs(X_test).argmax(1) == y_test).mean()
    assert acc_fp > 0.75, acc_fp

    # outlier-heavy calibration set: one corrupted image per 100 with a few
    # 1000x hot pixels (dead-sensor / cosmic-ray style)
    calib = [X_train[i:i + 100].copy() for i in range(0, 300, 100)]
    for c in calib:
        c[0, 0, ::4, ::4] = 1000.0

    q_max = QuantizedInferenceRunner(net, batch_size=100)
    q_max.calibrate(calib)
    acc_max = (q_max.predict_probs(X_test).argmax(1) == y_test).mean()

    q_pct = QuantizedInferenceRunner(net, batch_size=100)
    # 98th percentile: the corrupted image is <=1% of any layer's elements
    # (exactly 1% at the GAP output), so p98 sits safely in the clean bulk
    q_pct.calibrate(calib, percentile=98.0)
    acc_pct = (q_pct.predict_probs(X_test).argmax(1) == y_test).mean()

    # abs-max is measurably degraded by the outliers; percentile is not
    # (one-sided: the mild clipping regularises and can even score HIGHER
    # than fp32 — observed 0.893 vs 0.867 on this seed)
    assert acc_max < acc_fp - 0.05, (acc_fp, acc_max)
    assert acc_pct >= acc_fp - 0.01, (acc_fp, acc_pct)

    # percentile-derived scales persist exactly like abs-max ones
    scales = q_pct.get_scales()
    assert all(s is not None and s > 0 for s in scales)
    q2 = QuantizedInferenceRunner(net, batch_size=100)
    q2.set_scales(scales)
    np.testing.assert_array_equal(q_pct.predict_probs(X_test),
                                  q2.predict_probs(X_test))

    with pytest.raises(ValueError):
        q_pct.calibrate(calib, percentile=0.0)


def test_scale_persistence_roundtrip():
    """get_scales()/set_scales(): a fresh serving process rebuilt from the
    fp32 checkpoint plus the saved scale list must produce the exact probs
    of the originally-calibrated runner (no calibration data needed)."""
    from dorknet_tpu.models import MNISTNet

    np.random.seed(0)
    X = np.random.randn(16, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 16)]
    net = _trained(MNISTNet("q-persist"), X, y)

    q1 = QuantizedInferenceRunner(net, batch_size=16)
    assert all(s is None for s in q1.get_scales())  # dynamic before calib
    q1.calibrate([X])
    scales = q1.get_scales()
    assert all(s is not None and s > 0 for s in scales)

    q2 = QuantizedInferenceRunner(net, batch_size=16)  # fresh process stand-in
    q2.set_scales(scales)
    np.testing.assert_array_equal(q1.predict_probs(X), q2.predict_probs(X))

    with pytest.raises(ValueError):
        q2.set_scales(scales[:-1])


def test_quantized_sharded_serving_matches():
    """int8 serving under a data-sharded batch (8-device mesh) must match the
    single-device quantized outputs — the per-tensor dynamic scale is a global
    max, which XLA reduces across devices from the sharding alone."""
    from dorknet_tpu.models import MNISTNet
    from dorknet_tpu.parallel.mesh import make_mesh, batch_sharding

    np.random.seed(0)
    X = np.random.randn(16, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 16)]
    net = _trained(MNISTNet("q-shard"), X, y, steps=2)

    q = QuantizedInferenceRunner(net, batch_size=16)
    mesh = make_mesh({"data": 8})
    qs = QuantizedInferenceRunner(net, batch_size=16,
                                  batch_sharding=batch_sharding(mesh))
    np.testing.assert_allclose(q.predict_probs(X), qs.predict_probs(X),
                               atol=1e-5)


def test_quantized_ragged_and_refresh():
    """Inherited chunk/pad serving API works, and refresh() re-quantises
    after further training of the source network."""
    from dorknet_tpu.models import MNISTNet

    np.random.seed(0)
    X = np.random.randn(10, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 10)]
    net = MNISTNet("q-ragged")
    tr = Trainer(net, SGDMomentum(net, 0.01, 0.9))
    tr.step(X, y)

    q = QuantizedInferenceRunner(net, batch_size=4)
    probs = q.predict_probs(X)  # 10 = 2 full batches + ragged 2
    assert probs.shape == (10, 10)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-3)

    before = q.predict_probs(X)
    tr.step(X, y)
    q.refresh()
    after = q.predict_probs(X)
    assert np.abs(before - after).max() > 0  # new weights really captured


@pytest.mark.parametrize("family", ["mobilenet_v2", "mobilenet_v3",
                                    "resnet50"])
def test_quantized_stretch_models(family):
    """The stretch zoo quantises too (ReLu6 / hard-swish / squeeze-excite /
    bottleneck residual / identity post-skip structures) — top-1 agreement
    with the fp32 server. SE layers run unquantised (plain fapply nodes,
    inside residual recursion) and must not disturb the calibration walk."""
    from dorknet_tpu.models import MobileNetV2, MobileNetV3Small, ResNet50

    np.random.seed(0)
    if family == "mobilenet_v2":
        net = MobileNetV2("q-mnv2", num_classes=6, width_mult=0.25)
    elif family == "mobilenet_v3":
        net = MobileNetV3Small("q-mnv3", num_classes=6, width_mult=0.5)
    else:
        net = ResNet50("q-r50", num_classes=6)
    X = np.random.randn(4, 3, 64, 64).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[np.random.randint(0, 6, 4)]
    net = _trained(net, X, y, steps=2, lr=0.001)

    fp = InferenceRunner(net, batch_size=4, fold_bn=True)
    q = QuantizedInferenceRunner(net, batch_size=4)
    q.calibrate([X])
    p_fp, p_q = fp.predict_probs(X), q.predict_probs(X)
    assert (p_fp.argmax(1) == p_q.argmax(1)).mean() == 1.0
    # MobileNet's narrow inverted bottlenecks are the classic PTQ-sensitive
    # case (worse still at width 0.25) — decisions agree but probabilities
    # drift more than the ResNet families'
    tol = 0.12 if family.startswith("mobilenet") else 0.06
    assert np.abs(p_fp - p_q).max() < tol


def test_quantized_under_bf16_policy():
    """The serving benches run the quantizer under set_compute_dtype(bf16)
    (non-quant layers + rescale outputs flow bf16) — decisions must still
    match the fp32-policy quantized server."""
    import jax.numpy as jnp
    import dorknet_tpu
    from dorknet_tpu.models import MNISTNet

    np.random.seed(0)
    X = np.random.randn(16, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 16)]
    # train to confident decisions: a 3-step net's near-uniform probs let
    # bf16 rounding flip genuine coin-toss argmaxes
    net = _trained(MNISTNet("q-bf16"), X, y, steps=12, lr=0.05)

    q32 = QuantizedInferenceRunner(net, batch_size=16)
    q32.calibrate([X])
    p32 = q32.predict_probs(X)

    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        qb = QuantizedInferenceRunner(net, batch_size=16)
        qb.calibrate([X])
        pb = qb.predict_probs(X)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)
    assert (p32.argmax(1) == pb.argmax(1)).mean() == 1.0
    assert np.abs(p32 - pb).max() < 0.05


def test_quantized_predict_iter_streams_batches():
    """The inherited streaming API (prefetched device_put, ragged padding)
    works against the quantised program and matches predict_probs."""
    from dorknet_tpu.models import MNISTNet

    np.random.seed(0)
    X = np.random.randn(10, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 10)]
    net = _trained(MNISTNet("q-iter"), X, y, steps=1)
    q = QuantizedInferenceRunner(net, batch_size=4)

    batches = [(X[:4], "a"), (X[4:8], "b"), (X[8:], "c")]  # ragged tail
    outs = list(q.predict_iter(iter(batches)))
    assert [tag for _, tag in outs] == ["a", "b", "c"]
    got = np.concatenate([p for p, _ in outs], axis=0)
    np.testing.assert_allclose(got, q.predict_probs(X), atol=1e-6)
