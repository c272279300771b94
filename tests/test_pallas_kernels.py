"""Pallas kernels (interpreter mode on CPU) vs the XLA-native oracles."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dorknet_tpu.ops.pallas.depthwise as pdw
from dorknet_tpu.ops.pallas.bn_stats import batch_norm_stats
from dorknet_tpu.ops.pallas.matmul import matmul
from dorknet_tpu.ops.conv import depthwise_conv2d

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pdw, "_INTERPRET", True)


def test_bn_stats_matches_numpy():
    x = np.random.randn(4, 9, 9, 16).astype(np.float32) * 3 + 1.5
    mean, var = batch_norm_stats(jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(mean), x.reshape(-1, 16).mean(0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), x.reshape(-1, 16).var(0),
                               rtol=1e-4, atol=1e-4)


def test_bn_stats_nonaligned_rows():
    # M = 4*5*5 = 100, not a multiple of the 512 block: zero-padding must not
    # bias the statistics.
    x = np.random.randn(4, 5, 5, 8).astype(np.float32) + 7.0
    mean, var = batch_norm_stats(jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(mean), x.reshape(-1, 8).mean(0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), x.reshape(-1, 8).var(0),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("M,K,N", [(64, 32, 48), (300, 512, 120), (8, 16, 128)])
def test_matmul(M, K, N):
    a = np.random.randn(M, K).astype(np.float32)
    b = np.random.randn(K, N).astype(np.float32)
    got = np.asarray(matmul(jnp.asarray(a), jnp.asarray(b), interpret=True))
    np.testing.assert_allclose(got, a @ b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("M,K,N,bm,bn", [
    (64, 32, 48, 512, 256),     # single tile, padded N
    (300, 64, 120, 64, 128),    # multi-tile both axes, padded M and N
    (8, 16, 128, 512, 256),     # tiny M
])
def test_matmul_bn_stats(M, K, N, bm, bn):
    """Fused GEMM+stats epilogue == plain GEMM + np mean/biased-var, with
    y in the requested dtype and stats unpolluted by tile padding."""
    from dorknet_tpu.ops.pallas.matmul import matmul_bn_stats

    rng = np.random.RandomState(0)
    a = rng.randn(M, K).astype(np.float32)
    b = rng.randn(K, N).astype(np.float32)
    y, mean, var = matmul_bn_stats(jnp.asarray(a), jnp.asarray(b),
                                   bm=bm, bn=bn, interpret=True)
    ref = a @ b
    assert y.shape == (M, N) and y.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mean), ref.mean(0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var), ref.var(0),
                               rtol=1e-3, atol=1e-3)


def test_matmul_bn_stats_bf16_out():
    from dorknet_tpu.ops.pallas.matmul import matmul_bn_stats

    rng = np.random.RandomState(1)
    a = rng.randn(96, 32).astype(np.float32)
    b = rng.randn(32, 128).astype(np.float32)
    y, mean, var = matmul_bn_stats(
        jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
        interpret=True)
    assert y.dtype == jnp.bfloat16
    ref = a @ b
    # stats accumulate in fp32 from the fp32 MXU product, NOT from the
    # rounded bf16 output — tolerance reflects bf16 inputs only
    np.testing.assert_allclose(np.asarray(mean), ref.mean(0),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(var), ref.var(0),
                               rtol=5e-2, atol=5e-1)


@pytest.mark.parametrize("stride,H", [(1, 10), (2, 10), (2, 9)])
def test_depthwise3x3_forward(stride, H):
    x = np.random.randn(2, H, H, 8).astype(np.float32)
    w = np.random.randn(8, 3, 3).astype(np.float32)
    got = np.asarray(pdw.depthwise3x3(jnp.asarray(x), jnp.asarray(w), stride))
    ref = np.asarray(depthwise_conv2d(jnp.asarray(x), jnp.asarray(w),
                                      None, stride, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_depthwise3x3_bf16_flow():
    """bf16 in -> bf16 out with fp32 accumulation: matches the fp32 kernel on
    bf16-representable inputs, and the output dtype follows the input."""
    x = (np.random.randint(-8, 8, (2, 10, 10, 8)) / 4.0).astype(np.float32)
    w = (np.random.randint(-8, 8, (8, 3, 3)) / 8.0).astype(np.float32)
    y16 = pdw.depthwise3x3(jnp.asarray(x, jnp.bfloat16), jnp.asarray(w), 1)
    assert y16.dtype == jnp.bfloat16
    y32 = pdw.depthwise3x3(jnp.asarray(x), jnp.asarray(w), 1)
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32), rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("stride,H", [(1, 8), (2, 8), (2, 9)])
def test_depthwise3x3_grads_match_xla(stride, H):
    Ho = (H - 1) // stride + 1
    x = np.random.randn(2, H, H, 8).astype(np.float32)
    w = np.random.randn(8, 3, 3).astype(np.float32)
    dy = np.random.randn(2, Ho, Ho, 8).astype(np.float32)

    def loss_pallas(x_, w_):
        return jnp.sum(pdw.depthwise3x3(x_, w_, stride) * jnp.asarray(dy))

    def loss_xla(x_, w_):
        return jnp.sum(depthwise_conv2d(x_, w_, None, stride, 1) * jnp.asarray(dy))

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-3)


# --------------------------------------------------------------------- #
# Fused augmentation kernel (ops/pallas/augment.py) vs the XLA planes
# pipeline it replaces — the planes path is itself pinned against the
# per-image cv2-matched oracles, so exactness here chains all the way up.
# --------------------------------------------------------------------- #

AUG_CFG = dict(hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
               rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
               crop_mode="random")


@pytest.fixture
def _aug_interpret(monkeypatch):
    import dorknet_tpu.ops.pallas.augment as pa

    monkeypatch.setattr(pa, "_INTERPRET", True)
    return pa


@pytest.mark.parametrize("cfg", [
    AUG_CFG,
    dict(AUG_CFG, crop_mode="center"),
    dict(AUG_CFG, rotation_tuple=None),           # crop+HSV+flip only
    dict(AUG_CFG, hsv_pert_tuples=None),          # crop+rotate+flip only
    dict(hsv_pert_tuples=None, rotation_tuple=None,
         horizontal_flip_prob=None, crop_mode="random"),  # crop only
])
def test_pallas_augment_matches_planes(cfg, _aug_interpret):
    from dorknet_tpu.data_loading.device_augment import (
        augment_batch_planes, draw_batch_params)

    rng = np.random.RandomState(0)
    B, pre, out = 4, 40, (32, 32)
    x = jnp.asarray(rng.randint(0, 255, (B, 3, pre, pre), dtype=np.uint8))
    params = draw_batch_params(jax.random.PRNGKey(3), B, (pre, pre), out,
                               **cfg)
    want = np.asarray(augment_batch_planes(x, params, out, **cfg))
    got = np.asarray(_aug_interpret.augment_planes_fused(x, params, out,
                                                         **cfg))
    np.testing.assert_array_equal(got, want)  # same algorithm: bit-exact


def test_pallas_augment_bf16_hsv_dtype_matches_planes(_aug_interpret):
    """Under the bf16 policy the trainer passes hsv_dtype="bfloat16" — BOTH
    paths ignore it for uint8 inputs (HSV math pinned to fp32: fusion-
    internal temporaries, and Mosaic can't lower bf16 comparisons), so the
    kernel must still match the planes path bit-for-bit."""
    from dorknet_tpu.data_loading.device_augment import (
        augment_batch_planes, draw_batch_params)

    rng = np.random.RandomState(1)
    B, pre, out = 3, 30, (24, 24)
    x = jnp.asarray(rng.randint(0, 255, (B, 3, pre, pre), dtype=np.uint8))
    params = draw_batch_params(jax.random.PRNGKey(5), B, (pre, pre), out,
                               **AUG_CFG)
    want = np.asarray(augment_batch_planes(x, params, out,
                                           hsv_dtype="bfloat16", **AUG_CFG))
    got = np.asarray(_aug_interpret.augment_planes_fused(
        x, params, out, hsv_dtype="bfloat16", **AUG_CFG))
    np.testing.assert_array_equal(got, want)


def test_train_pipeline_pallas_gate_matches_planes(_aug_interpret):
    """train_pipeline(use_pallas_aug=True) equals the default planes path end
    to end (including -128 shift and mixup) — the production switch."""
    from dorknet_tpu.data_loading.device_augment import train_pipeline

    rng = np.random.RandomState(2)
    B, pre, out = 4, 40, (32, 32)
    x = jnp.asarray(rng.randint(0, 255, (B, pre, pre, 3), dtype=np.uint8))
    oh = jnp.asarray(np.eye(5, dtype=np.float32)[rng.randint(0, 5, B)])
    key = jax.random.PRNGKey(9)
    cfg = dict(AUG_CFG, mixup=(0.0, 0.3))
    want_x, want_y = train_pipeline(key, x, oh, out, use_pallas_aug=False,
                                    **cfg)
    got_x, got_y = train_pipeline(key, x, oh, out, use_pallas_aug=True,
                                  **cfg)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(want_x))
    np.testing.assert_array_equal(np.asarray(got_y), np.asarray(want_y))


def test_pallas_augment_lowers_to_tpu_mosaic():
    """jax.export cross-platform lowering runs the REAL Mosaic kernel
    compiler (no TPU needed) — catches unsupported-primitive regressions
    interpret mode hides (integer rem, jnp.select's argmax, f32 iota,
    value-level dynamic_slice, uint8<->float casts were all found this way)."""
    from dorknet_tpu.data_loading.device_augment import draw_batch_params
    from dorknet_tpu.ops.pallas.augment import augment_planes_fused

    B, pre, out = 2, 281, (225, 225)
    x = jnp.zeros((B, 3, pre, pre), jnp.uint8)
    for hsv_dtype in (None, "bfloat16"):
        params = draw_batch_params(jax.random.PRNGKey(1), B, (pre, pre), out,
                                   **AUG_CFG)
        fn = jax.jit(lambda x, p, hd=hsv_dtype: augment_planes_fused(
            x, p, out, hsv_dtype=hd, **AUG_CFG))
        exported = jax.export.export(fn, platforms=["tpu"])(x, params)
        assert len(exported.mlir_module_serialized) > 0


def test_pallas_augment_gates(monkeypatch, _aug_interpret):
    """The production gates: (a) on non-TPU backends every config setting
    (here the legacy global flag, forced on) falls back to the XLA planes
    path instead of failing to compile;
    (b) non-uint8 batches never enter the kernel (its rounding clamps to
    [0,255]); (c) configs whose per-image working set exceeds the VMEM
    bound fall back to the planes path without building a kernel."""
    import dorknet_tpu
    import dorknet_tpu.ops.pallas.augment as pa
    from dorknet_tpu.data_loading.device_augment import (
        augment_batch_planes, draw_batch_params, train_pipeline)

    rng = np.random.RandomState(0)
    B, pre, out = 2, 40, (32, 32)
    x_hwc = jnp.asarray(rng.randint(0, 255, (B, pre, pre, 3), dtype=np.uint8))
    oh = jnp.asarray(np.eye(3, dtype=np.float32)[rng.randint(0, 3, B)])

    # (a) global flag on a CPU backend resolves to the planes path (a pallas
    # compile would raise "Only interpret mode is supported on CPU backend")
    dorknet_tpu.set_use_pallas(True)
    try:
        out_x, _ = train_pipeline(jax.random.PRNGKey(0), x_hwc, oh, out,
                                  **AUG_CFG)
        assert np.isfinite(np.asarray(out_x, np.float32)).all()
    finally:
        dorknet_tpu.set_use_pallas(False)

    # (b) non-uint8 ints are refused by the kernel entry point
    params = draw_batch_params(jax.random.PRNGKey(1), B, (pre, pre), out,
                               **AUG_CFG)
    x_i32 = jnp.asarray(rng.randint(0, 255, (B, 3, pre, pre)), jnp.int32)
    with pytest.raises(AssertionError, match="uint8"):
        _aug_interpret.augment_planes_fused(x_i32, params, out, **AUG_CFG)

    # (c) VMEM guard: a 640px output exceeds the bound -> planes fallback,
    # bit-equal, and pallas_call is never invoked
    big_pre, big_out = 800, (640, 640)
    xb = jnp.asarray(rng.randint(0, 255, (1, 3, big_pre, big_pre),
                                 dtype=np.uint8))
    pb = draw_batch_params(jax.random.PRNGKey(2), 1, (big_pre, big_pre),
                           big_out, **AUG_CFG)
    want = np.asarray(augment_batch_planes(xb, pb, big_out, **AUG_CFG))

    def boom(*a, **k):
        raise AssertionError("pallas_call must not run above the VMEM bound")

    monkeypatch.setattr(pa.pl, "pallas_call", boom)
    got = np.asarray(_aug_interpret.augment_planes_fused(xb, pb, big_out,
                                                         **AUG_CFG))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_pallas_kernels_true_aot_compile_v5e():
    """The FULL libtpu AOT pipeline (XLA + Mosaic backend incl. layout/
    alignment legalisation) accepts every Pallas kernel, chip-free, against
    an abstract v5e topology. Strictly stronger than the jax.export check
    above: export passed while the real backend rejected the aug kernel's
    dynamic-origin crop load ("index in dimension 2 is a multiple of 8",
    PERF.md round-3 session-4). Runs scripts/aot_check.py in a subprocess —
    the topology API loads the tpu PJRT plugin, which must not leak into
    this forced-CPU test process."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "scripts.aot_check"],
        cwd=REPO_ROOT, capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": ""})
    out = r.stdout + r.stderr
    if r.returncode == 3:
        pytest.skip("no local libtpu topology available: " + out.strip()[-200:])
    assert r.returncode == 0, out[-3000:]
    assert "all pallas kernels AOT-compile" in out


def test_pallas_aug_tristate_resolution(monkeypatch):
    """config.set_use_pallas_aug's per-site defaults (PERF.md round-3
    session-5: the kernel WINS as the standalone aug program, LOSES inside
    the fused train step): train_pipeline resolves None -> ON for a TPU
    backend / OFF elsewhere; the trainer's fused step resolves None -> OFF
    unless the legacy global forces it; False beats the global everywhere;
    non-TPU backends always fall back. Resolution only — the captured flag
    never reaches a kernel compile."""
    import dorknet_tpu
    import dorknet_tpu.data_loading.device_augment as da
    from dorknet_tpu.config import set_use_pallas_aug
    from dorknet_tpu.layers import (ConvLayer, GlobalAveragePoolingLayer,
                                    DenseLayer, SoftmaxWithCrossEntropy)
    from dorknet_tpu.network import FeedForwardNetwork, Trainer
    from dorknet_tpu.optimisers import SGD

    captured = {}

    def fake_impl(key, x, oh, out_hw, *args):
        captured["flag"] = args[-1]
        return x, oh

    monkeypatch.setattr(da, "_train_pipeline_impl", fake_impl)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (2, 12, 12, 3), dtype=np.uint8))
    oh = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 1]])

    def resolve(backend, tri, global_flag=False):
        monkeypatch.setattr(da.jax, "default_backend", lambda: backend)
        set_use_pallas_aug(tri)
        dorknet_tpu.set_use_pallas(global_flag)
        try:
            da.train_pipeline(jax.random.PRNGKey(0), x, oh, (8, 8),
                              **AUG_CFG)
            return captured["flag"]
        finally:
            set_use_pallas_aug(None)
            dorknet_tpu.set_use_pallas(False)

    assert resolve("tpu", None) is True      # standalone default: ON
    assert resolve("tpu", False) is False    # explicit off wins
    assert resolve("cpu", None) is False     # non-TPU always falls back
    assert resolve("cpu", True) is False     # even forced-on (structural)

    np.random.seed(3)
    net = FeedForwardNetwork("tristate")
    net.add_layer(ConvLayer("c0", filter_block_shape=(4, 3, 3, 3)))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("d", incoming_chans=4, output_dim=3))
    net.set_loss_layer(SoftmaxWithCrossEntropy("sm"))
    tr = Trainer(net, SGD(net, 0.01))
    fa = lambda: tr._freeze_aug((8, 8), AUG_CFG["hsv_pert_tuples"],
                                AUG_CFG["rotation_tuple"],
                                AUG_CFG["horizontal_flip_prob"],
                                "random", None)[-1]

    import dorknet_tpu.network.trainer as trmod
    monkeypatch.setattr(trmod.jax, "default_backend", lambda: "tpu")
    try:
        assert fa() is False                 # fused-step default: OFF
        set_use_pallas_aug(True)
        assert fa() is True                  # explicit opt-in
        set_use_pallas_aug(None)
        dorknet_tpu.set_use_pallas(True)
        assert fa() is True                  # legacy global opt-in
        set_use_pallas_aug(False)
        assert fa() is False                 # explicit off beats the global
    finally:
        set_use_pallas_aug(None)
        dorknet_tpu.set_use_pallas(False)
