"""Pallas kernels (interpreter mode on CPU) vs the XLA-native oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dorknet_tpu.ops.pallas.depthwise as pdw
from dorknet_tpu.ops.pallas.bn_stats import batch_norm_stats
from dorknet_tpu.ops.pallas.matmul import matmul
from dorknet_tpu.ops.conv import depthwise_conv2d


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
