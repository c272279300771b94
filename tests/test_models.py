"""Model zoo: shapes, one train step, checkpoint round-trip for each family."""

import numpy as np
import pytest

from dorknet_tpu.network import FeedForwardNetwork, Trainer
from dorknet_tpu.optimisers import SGDMomentum
from dorknet_tpu.models import MNISTNet, ResNet18, MobileNetV2, ResNet50


def _one_step_and_roundtrip(net, X, n_classes, tmp_path):
    y = np.eye(n_classes, dtype=np.float32)[np.random.randint(0, n_classes,
                                                              X.shape[0])]
    tr = Trainer(net, SGDMomentum(net, 0.01, 0.9))
    loss, preds = tr.step(X, y)
    assert np.isfinite(float(loss))
    _, probs = net.forward(X, None, test_mode=True)
    assert np.asarray(probs).shape == (X.shape[0], n_classes)
    np.testing.assert_allclose(np.asarray(probs).sum(1), 1.0, rtol=1e-4)

    h5f, jsf = str(tmp_path / "m.h5"), str(tmp_path / "m.json")
    net.save_weights_to_h5(h5f)
    net.save_layer_structure_to_json(jsf)
    net2 = FeedForwardNetwork("")
    net2.load_network_from_json_and_h5(jsf, h5f)
    _, probs2 = net2.forward(X, None, test_mode=True)
    np.testing.assert_allclose(np.asarray(probs2), np.asarray(probs),
                               rtol=1e-4, atol=1e-5)


def test_mnist_net(tmp_path):
    np.random.seed(0)
    net = MNISTNet("m")
    X = np.random.randn(4, 1, 28, 28).astype(np.float32)
    _one_step_and_roundtrip(net, X, 10, tmp_path)


def test_resnet18_depsep_small_input(tmp_path):
    np.random.seed(0)
    net = ResNet18("r18", num_classes=7)
    X = np.random.randn(2, 3, 64, 64).astype(np.float32)
    _one_step_and_roundtrip(net, X, 7, tmp_path)


def test_mobilenet_v2(tmp_path):
    np.random.seed(0)
    net = MobileNetV2("mnv2", num_classes=6, width_mult=0.25)
    X = np.random.randn(2, 3, 64, 64).astype(np.float32)
    _one_step_and_roundtrip(net, X, 6, tmp_path)


def test_resnet50(tmp_path):
    np.random.seed(0)
    net = ResNet50("r50", num_classes=5)
    X = np.random.randn(2, 3, 64, 64).astype(np.float32)
    _one_step_and_roundtrip(net, X, 5, tmp_path)


def test_resnet18_plain_variant(tmp_path):
    from dorknet_tpu.models import build_resnet18_plain

    np.random.seed(0)
    net = build_resnet18_plain("r18p", num_classes=6)
    X = np.random.randn(2, 3, 64, 64).astype(np.float32)
    _one_step_and_roundtrip(net, X, 6, tmp_path)


def _converges_on_channel_task(net, n_classes, steps, lr, signal,
                               image=32, batch=16):
    """Convergence smoke: class signal in channel intensity (survives GAP).
    Deep stretch models need a gentle lr on this tiny task — higher rates
    overflow the parity (non-max-subtracted) softmax."""
    tr = Trainer(net, SGDMomentum(net, lr, 0.9))
    rng = np.random.RandomState(0)
    losses = []
    for i in range(steps):
        y = rng.randint(0, n_classes, batch)
        X = rng.randn(batch, 3, image, image).astype(np.float32)
        X += signal * y[:, None, None, None]
        loss, _ = tr.step(X, np.eye(n_classes, dtype=np.float32)[y])
        losses.append(float(loss))
    head, tail = np.mean(losses[:5]), np.mean(losses[-5:])
    assert tail < 0.8 * head, (head, tail, losses[-5:])


def test_mobilenet_v2_convergence_smoke():
    np.random.seed(0)
    _converges_on_channel_task(MobileNetV2("mnv2-conv", num_classes=4,
                                           width_mult=0.25), 4,
                               steps=50, lr=5e-4, signal=0.5)


@pytest.mark.slow
def test_resnet50_convergence_smoke():
    np.random.seed(0)
    _converges_on_channel_task(ResNet50("r50-conv", num_classes=4), 4,
                               steps=60, lr=5e-4, signal=0.125)


def test_mobilenet_v3_small(tmp_path):
    """MNv3-Small: SE gating + hard-swish + 5x5 depthwise through one step,
    test-mode forward and the h5+json round-trip (SqueezeExciteLayer has its
    own four-dataset schema)."""
    from dorknet_tpu.models import MobileNetV3Small

    np.random.seed(0)
    net = MobileNetV3Small("mnv3", num_classes=6, width_mult=0.5)
    X = np.random.randn(2, 3, 64, 64).astype(np.float32)
    _one_step_and_roundtrip(net, X, 6, tmp_path)


def test_mobilenet_v3_convergence_smoke():
    from dorknet_tpu.models import MobileNetV3Small

    np.random.seed(0)
    # 2e-3 (vs the other families' 5e-4): the SE gates and the two-stage
    # dense head start near-saturated and need a few more effective steps
    _converges_on_channel_task(MobileNetV3Small("mnv3-conv", num_classes=4,
                                                width_mult=0.5), 4,
                               steps=60, lr=2e-3, signal=0.5)


def test_efficientnet_lite0(tmp_path):
    """EfficientNet-Lite0: MBConv trunk (3x3 + 5x5 depthwise, linear
    bottlenecks) through one step, test-mode forward and h5+json round-trip;
    the lite rules pin stem=32 / head=1280 channels unscaled."""
    from dorknet_tpu.models import EfficientNetLite, EfficientNetLite0

    np.random.seed(0)
    net = EfficientNetLite0("enl0", num_classes=6)
    X = np.random.randn(2, 3, 64, 64).astype(np.float32)
    _one_step_and_roundtrip(net, X, 6, tmp_path)

    # lite scaling rules: width scales interior stages only, depth exempts
    # the first and last stage
    wide = EfficientNetLite("enl-w", num_classes=3, width_mult=1.4,
                            depth_mult=1.0)
    names = [l.layer_name for l in wide.layers]
    assert wide.layers[names.index("stem")].learned_params[
        "weights"].shape[0] == 32  # unscaled stem
    assert wide.layers[names.index("head")].learned_params[
        "weights"].shape[0] == 1280  # unscaled head
    deep = EfficientNetLite("enl-d", num_classes=3, width_mult=1.0,
                            depth_mult=2.0)
    # first stage (1 block) and last stage (1 block) unscaled, interior
    # stages double: 1 + 2*(2+2+3+3+4) + 1 = 30 blocks vs B0's 16
    def count_blocks(net_):
        seen = set()
        for l in net_.layers:
            nm = l.layer_name
            if nm.startswith("mb"):
                seen.add(nm.split("_")[0])
        return len(seen)
    assert count_blocks(wide) == 16
    assert count_blocks(deep) == 30


def test_efficientnet_lite_convergence_smoke():
    from dorknet_tpu.models import EfficientNetLite

    np.random.seed(0)
    _converges_on_channel_task(EfficientNetLite("enl-conv", num_classes=4,
                                                width_mult=0.25), 4,
                               steps=50, lr=5e-4, signal=0.5)


def test_squeeze_excite_layer_semantics():
    """SE math: with zeroed FC weights the gate is hardsigmoid(bias)=0.5
    everywhere -> output is exactly x/2; gradients flow to all four params."""
    import jax
    import jax.numpy as jnp
    from dorknet_tpu.layers import SqueezeExciteLayer

    np.random.seed(0)
    se = SqueezeExciteLayer("se", incoming_chans=8, reduced_chans=4)
    x = jnp.asarray(np.random.randn(2, 5, 5, 8), jnp.float32)
    zeroed = {k: jnp.zeros_like(v) for k, v in se.learned_params.items()}
    y, _ = se.fapply(zeroed, {}, x, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 0.5, rtol=1e-6)

    def loss(p):
        y, _ = se.fapply(p, {}, x, True)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(se.learned_params)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())
    assert float(jnp.abs(g["w_reduce"]).max()) > 0
    assert float(jnp.abs(g["b_expand"]).max()) > 0


def test_gradcam_on_mobilenet_v3_two_stage_head():
    """MNv3's head is GAP -> Dense(1024) -> HardSwish -> Dense(classes):
    plain CAM (classifier-weight projection) is structurally INVALID there
    (the classifier rows live over the 1024 hidden units, not the conv
    channels) — Grad-CAM differentiates through the whole head and stays
    exact. Pins vjp flow through SE gates, hard-swish and the two-stage
    head."""
    from dorknet_tpu.models import MobileNetV3Small
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.cam import compute_gradcam_scores_batch

    np.random.seed(0)
    net = MobileNetV3Small("mnv3-gc", num_classes=5, width_mult=0.5)
    tr = Trainer(net, SGDMomentum(net, 1e-3, 0.9))
    X = np.random.randn(4, 3, 64, 64).astype(np.float32)
    yoh = np.eye(5, dtype=np.float32)[np.random.randint(0, 5, 4)]
    tr.step(X, yoh)  # initialise BN running stats

    scores, cams = compute_gradcam_scores_batch(
        net, X, top_k=2, terminal_layer_name="head_hswish", out_size=32)
    c = np.asarray(cams)
    assert c.shape == (4, 2, 32, 32)
    assert np.isfinite(c).all() and c.min() >= 0.0 and c.max() <= 1.0 + 1e-5
    s = np.asarray(scores)
    np.testing.assert_allclose(s.sum(1), 1.0, rtol=1e-4)


def test_mobilenet_v3_large(tmp_path):
    """MNv3-Large: shares the Small builder (stage table + head widths
    differ — 960-ch head conv, 1280-wide classifier stage, and a first
    bneck with NO expansion since exp==in_ch); one step, test-mode forward
    and the h5+json round-trip at width 0.5."""
    from dorknet_tpu.models import MobileNetV3Large

    np.random.seed(0)
    net = MobileNetV3Large("mnv3l", num_classes=6, width_mult=0.5)
    # the paper's Large table: first bneck has exp == in_ch -> no expand
    # pointwise; its depthwise works on the stem's 8 (16*0.5) channels.
    # bneck0 is stride-1 in==out so it lives INSIDE a ResidualBlock —
    # the property must be asserted on the block's inner layer_list (the
    # top-level name scan was vacuous: inner layers never appear there)
    bneck0 = next(l for l in net.layers if l.layer_name == "bneck0")
    inner = [l.layer_name for l in bneck0.layer_list]
    assert "bneck0_expand" not in inner and "bneck0_dw" in inner
    assert inner[0] == "bneck0_dw"  # the block STARTS at the depthwise
    X = np.random.randn(2, 3, 64, 64).astype(np.float32)
    _one_step_and_roundtrip(net, X, 6, tmp_path)


def test_mobilenet_v3_large_convergence_smoke():
    from dorknet_tpu.models import MobileNetV3Large

    np.random.seed(0)
    _converges_on_channel_task(MobileNetV3Large("mnv3l-conv", num_classes=4,
                                                width_mult=0.5), 4,
                               steps=60, lr=2e-3, signal=0.5)


def test_resnet101(tmp_path):
    """ResNet-101: the deeper stage-3 (23 bottlenecks) on the shared
    ResNet-50 builder — one train step + h5 roundtrip."""
    from dorknet_tpu.models import ResNet101

    np.random.seed(0)
    net = ResNet101("r101", num_classes=5)
    assert sum(1 for l in net.layers
               if l.layer_name.startswith("s3b")) == 23
    X = np.random.randn(2, 3, 64, 64).astype(np.float32)
    _one_step_and_roundtrip(net, X, 5, tmp_path)
