"""NumPy stand-ins for the reference's compiled relu kernels
(``/root/reference/layers/relu_cy.pyx``). Train variants also return the
float 0/1 ``pos_locs`` mask (mask is ``out > 0`` — gradient is zero at
exactly-zero activations)."""
import numpy as np


def _fwd(X):
    return np.maximum(X, 0).astype(np.float32)


def relu_4d_forward_train(X):
    out = _fwd(X)
    return out, (out > 0).astype(np.float32)


def relu_4d_forward_test(X):
    return _fwd(X)


def relu_2d_forward_train(X):
    out = _fwd(X)
    return out, (out > 0).astype(np.float32)


def relu_2d_forward_test(X):
    return _fwd(X)
