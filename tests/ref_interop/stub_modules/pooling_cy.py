"""NumPy stand-ins for the reference's compiled max-pool kernels
(``/root/reference/layers/pooling_cy.pyx``): square window == stride.
Imported by the reference's layers/pooling.py; the golden nets don't use
MaxPool (the reference ships it broken) but the functions are real."""
import numpy as np


def _blocks(X, stride):
    B, C, H, W = X.shape
    P, Q = H // stride, W // stride
    v = X[:, :, :P * stride, :Q * stride].reshape(B, C, P, stride, Q, stride)
    return v, P, Q


def pool(X, stride):
    X = np.asarray(X, dtype=np.float32)
    v, _, _ = _blocks(X, stride)
    return v.max(axis=(3, 5)).astype(np.float32)


def pool_train(X, stride):
    X = np.asarray(X, dtype=np.float32)
    v, P, Q = _blocks(X, stride)
    out = v.max(axis=(3, 5))
    mask = (v == out[:, :, :, None, :, None]).astype(np.float32)
    max_locs = np.zeros_like(X, dtype=np.float32)
    max_locs[:, :, :P * stride, :Q * stride] = (
        mask.reshape(X.shape[0], X.shape[1], P * stride, Q * stride))
    return out.astype(np.float32), max_locs


def pool_backward(upstream_dx, max_locs, stride):
    upstream_dx = np.asarray(upstream_dx, dtype=np.float32)
    B, C, P, Q = upstream_dx.shape
    up = np.repeat(np.repeat(upstream_dx, stride, axis=2), stride, axis=3)
    out = np.zeros_like(max_locs, dtype=np.float32)
    out[:, :, :P * stride, :Q * stride] = up
    return (out * max_locs).astype(np.float32)
