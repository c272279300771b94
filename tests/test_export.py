"""Serving-artifact export extensions (network/inference.py).

test_serving.py pins the base export_program -> load_serving_program
round-trip; this file pins the round-3 extensions: the ServingArtifact
wrapper (arbitrary-N predict_probs with the runner's padding/chunking
protocol), polymorphic-batch artifacts, the .meta.json sidecar, policy
freezing, and the checkpoint->artifact CLI (scripts/export_serving). The
reference's deployment unit is "h5 + json + the model code" (reference
network/feed_forward_network.py:106-139); these artifacts need no framework
code at the destination.
"""

import numpy as np

import dorknet_tpu
from dorknet_tpu.models import MNISTNet
from dorknet_tpu.network import Trainer
from dorknet_tpu.network.inference import (InferenceRunner, ServingArtifact,
                                           load_serving_artifact)
from dorknet_tpu.network.quantized import QuantizedInferenceRunner
from dorknet_tpu.optimisers import SGDMomentum


def _serving_net(seed=0, steps=3):
    np.random.seed(seed)
    X = np.random.randn(16, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 16)]
    net = MNISTNet("export-net")
    tr = Trainer(net, SGDMomentum(net, 0.01, 0.9))
    for _ in range(steps):
        tr.step(X, y)
    return net, X


def test_artifact_roundtrip_matches_runner(tmp_path):
    net, X = _serving_net()
    runner = InferenceRunner(net, batch_size=8, fold_bn=True)
    path = str(tmp_path / "mnist.shlo")
    data = runner.export_program((28, 28), channels=1, path=path)
    assert len(data) > 0

    art = load_serving_artifact(path)
    assert isinstance(art, ServingArtifact)
    assert art.batch_size == 8 and art.input_shape == (1, 28, 28)
    assert not art.polymorphic_batch

    # Same program + same baked-in constants: bit-identical to the runner.
    np.testing.assert_array_equal(runner.predict_probs(X),
                                  art.predict_probs(X))
    # bytes loading path too
    np.testing.assert_array_equal(art.predict_probs(X),
                                  load_serving_artifact(data).predict_probs(X))


def test_export_meta_sidecar(tmp_path):
    import json

    net, _ = _serving_net()
    runner = InferenceRunner(net, batch_size=4)
    path = str(tmp_path / "m.shlo")
    runner.export_program((28, 28), channels=1, path=path)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    assert meta["input_shape"] == [4, 1, 28, 28]
    assert meta["input_dtype"] == "float32"
    assert meta["runner"] == "InferenceRunner"
    assert meta["output_avals"][0]["shape"] == [4, 10]
    assert meta["polymorphic_batch"] is False


def test_artifact_ragged_padding_matches_runner_protocol():
    """predict_probs on N not divisible by the compiled batch must chunk+pad
    exactly like the live runner (reference-eval protocol, SURVEY §3.2)."""
    net, X = _serving_net(seed=1)
    runner = InferenceRunner(net, batch_size=8, fold_bn=True)
    art = load_serving_artifact(runner.export_program((28, 28), channels=1))
    Xr = X[:13]  # 8 + ragged 5
    np.testing.assert_array_equal(runner.predict_probs(Xr),
                                  art.predict_probs(Xr))
    assert art.predict(Xr).shape == (13,)


def test_export_polymorphic_batch():
    net, X = _serving_net(seed=2)
    runner = InferenceRunner(net, batch_size=8, fold_bn=True)
    art = load_serving_artifact(
        runner.export_program((28, 28), channels=1, polymorphic_batch=True))
    assert art.polymorphic_batch and art.batch_size is None
    # any batch size, one artifact; matches the live runner's scores
    for n in (3, 8, 11):
        p = art.predict_probs(X[:n])
        assert p.shape == (n, 10)
        np.testing.assert_allclose(p, runner.predict_probs(X[:n]),
                                   rtol=0, atol=1e-6)


def test_polymorphic_artifact_chunks_to_max_batch():
    """A polymorphic artifact must NOT dispatch an eval-sized input as one
    giant device batch (OOM + compile-per-N); it chunks at max_batch, each
    chunk going through the jitted call."""
    net, X = _serving_net(seed=6)
    runner = InferenceRunner(net, batch_size=8, fold_bn=True)
    art = load_serving_artifact(
        runner.export_program((28, 28), channels=1, polymorphic_batch=True),
        max_batch=4)
    assert art.max_batch == 4
    seen = []
    inner = art._call
    art._call = lambda x: (seen.append(x.shape[0]), inner(x))[1]
    p = art.predict_probs(X[:11])
    assert seen == [4, 4, 3]  # no padding needed on the symbolic dim
    np.testing.assert_allclose(p, runner.predict_probs(X[:11]),
                               rtol=0, atol=1e-6)


def test_predict_probs_empty_input():
    """N=0 must return (0, num_classes) on every serving path instead of
    tripping np.concatenate([]) / the symbolic b>=1 constraint."""
    net, X = _serving_net(seed=7)
    runner = InferenceRunner(net, batch_size=8, fold_bn=True)
    empty = X[:0]
    assert runner.predict_probs(empty).shape == (0, 10)
    assert runner.predict(empty).shape == (0,)
    fixed = load_serving_artifact(
        runner.export_program((28, 28), channels=1))
    poly = load_serving_artifact(
        runner.export_program((28, 28), channels=1, polymorphic_batch=True))
    for art in (fixed, poly):
        p = art.predict_probs(empty)
        assert p.shape == (0, 10)
        assert art.predict(empty).shape == (0,)


def test_export_quantized_runner_artifact():
    net, X = _serving_net(seed=3)
    q = QuantizedInferenceRunner(net, batch_size=8)
    q.calibrate([X])
    art = load_serving_artifact(q.export_program((28, 28), channels=1))
    np.testing.assert_array_equal(q.predict_probs(X), art.predict_probs(X))


def test_export_cli_from_checkpoint(tmp_path):
    """scripts/export_serving: reference checkpoint (json+h5,
    SURVEY §3.4 schema) in, self-contained artifact out."""
    from scripts.export_serving import main as export_main

    net, X = _serving_net(seed=5)
    jpath, hpath = str(tmp_path / "net.json"), str(tmp_path / "net.h5")
    net.save_layer_structure_to_json(jpath)
    net.save_weights_to_h5(hpath)

    out = str(tmp_path / "net.shlo")
    export_main(["--json", jpath, "--h5", hpath, "--out", out,
                 "--input", "1,28,28", "--batch", "8"])

    art = load_serving_artifact(out)
    ref = InferenceRunner(net, batch_size=8, fold_bn=True)
    np.testing.assert_allclose(art.predict_probs(X), ref.predict_probs(X),
                               rtol=0, atol=1e-6)


def test_export_cli_int8_with_calibrated_scales(tmp_path):
    """--int8 --scales bakes calibrated activation scales into the artifact
    (the design invariant: fp32 ckpt + get_scales() floats reproduce a
    calibrated server exactly)."""
    import json

    from scripts.export_serving import main as export_main

    net, X = _serving_net(seed=8)
    q = QuantizedInferenceRunner(net, batch_size=8)
    q.calibrate([X])
    scales = q.get_scales()

    jpath, hpath = str(tmp_path / "net.json"), str(tmp_path / "net.h5")
    net.save_layer_structure_to_json(jpath)
    net.save_weights_to_h5(hpath)
    spath = str(tmp_path / "scales.json")
    with open(spath, "w") as f:
        json.dump(scales, f)

    out = str(tmp_path / "net_int8.shlo")
    export_main(["--json", jpath, "--h5", hpath, "--out", out,
                 "--input", "1,28,28", "--batch", "8", "--int8",
                 "--scales", spath])
    art = load_serving_artifact(out)
    np.testing.assert_array_equal(q.predict_probs(X), art.predict_probs(X))

    # inline-JSON spelling of the same flag
    out2 = str(tmp_path / "net_int8_inline.shlo")
    export_main(["--json", jpath, "--h5", hpath, "--out", out2,
                 "--input", "1,28,28", "--batch", "8", "--int8",
                 "--scales", json.dumps(scales)])
    np.testing.assert_array_equal(
        q.predict_probs(X), load_serving_artifact(out2).predict_probs(X))


def test_export_cli_int8_dw_weight_only(tmp_path):
    """--int8 --dw-weight-only exports the measured depthwise policy
    (PERF.md round-4 A/B): dw weights int8+scales, flow-dtype dw compute —
    the artifact must reproduce a weight_only_kinds runner exactly."""
    from dorknet_tpu.layers import (ConvLayer, DepthwiseConvLayer,
                                    BatchNormLayer, ReLu,
                                    GlobalAveragePoolingLayer, DenseLayer,
                                    SoftmaxWithCrossEntropy)
    from dorknet_tpu.network import FeedForwardNetwork
    from scripts.export_serving import main as export_main

    np.random.seed(11)
    net = FeedForwardNetwork("export-dw")
    net.add_layer(ConvLayer("c0", filter_block_shape=(8, 1, 3, 3)))
    net.add_layer(BatchNormLayer("b0", incoming_chans=8))
    net.add_layer(ReLu("r0"))
    net.add_layer(DepthwiseConvLayer("dw", filter_block_shape=(8, 3, 3),
                                     stride=1))
    net.add_layer(BatchNormLayer("b1", incoming_chans=8))
    net.add_layer(ReLu("r1"))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("d0", incoming_chans=8, output_dim=10))
    net.set_loss_layer(SoftmaxWithCrossEntropy("sm"))
    X = np.random.randn(16, 1, 28, 28).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[np.random.randint(0, 10, 16)]
    tr = Trainer(net, SGDMomentum(net, 0.01, 0.9))
    for _ in range(3):
        tr.step(X, y)

    jpath, hpath = str(tmp_path / "net.json"), str(tmp_path / "net.h5")
    net.save_layer_structure_to_json(jpath)
    net.save_weights_to_h5(hpath)

    out = str(tmp_path / "net_dw.shlo")
    export_main(["--json", jpath, "--h5", hpath, "--out", out,
                 "--input", "1,28,28", "--batch", "8", "--int8",
                 "--dw-weight-only"])
    q = QuantizedInferenceRunner(
        net, batch_size=8, weight_only_kinds=("DepthwiseConvLayer",))
    np.testing.assert_array_equal(
        q.predict_probs(X), load_serving_artifact(out).predict_probs(X))


def test_export_respects_compute_dtype_policy():
    """The artifact freezes the policy ACTIVE at export time — flipping the
    global dtype afterwards must not change what a loaded artifact serves."""
    import jax.numpy as jnp

    net, X = _serving_net(seed=4)
    runner = InferenceRunner(net, batch_size=8, fold_bn=True)
    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        p_bf16 = runner.predict_probs(X)  # retraces under bf16 policy
        data = runner.export_program((28, 28), channels=1)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)
    art = load_serving_artifact(data)
    np.testing.assert_array_equal(p_bf16, art.predict_probs(X))
