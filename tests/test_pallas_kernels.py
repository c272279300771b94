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


def test_depthwise3x3_forward():
    x = np.random.randn(2, 10, 10, 8).astype(np.float32)
    w = np.random.randn(8, 3, 3).astype(np.float32)
    got = np.asarray(pdw.depthwise3x3(jnp.asarray(x), jnp.asarray(w)))
    ref = np.asarray(depthwise_conv2d(jnp.asarray(x), jnp.asarray(w),
                                      None, 1, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_depthwise3x3_grads_match_xla():
    x = np.random.randn(2, 8, 8, 8).astype(np.float32)
    w = np.random.randn(8, 3, 3).astype(np.float32)
    dy = np.random.randn(2, 8, 8, 8).astype(np.float32)

    def loss_pallas(x_, w_):
        return jnp.sum(pdw.depthwise3x3(x_, w_) * jnp.asarray(dy))

    def loss_xla(x_, w_):
        return jnp.sum(depthwise_conv2d(x_, w_, None, 1, 1) * jnp.asarray(dy))

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-3)
