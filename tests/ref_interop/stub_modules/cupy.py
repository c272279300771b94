"""NumPy facade standing in for ``cupy`` so the reference Dorknet code runs
on its CPU path without a GPU (the reference imports cupy unconditionally,
``/root/reference/layers/layer.py:1``). Only used by the interchange runner
subprocess — never imported by dorknet_tpu itself."""
import numpy as _np
from numpy import *  # noqa: F401,F403  (dot, zeros, sum, exp, sqrt, newaxis, ...)

ndarray = _np.ndarray


def get_array_module(*args):
    return _np


def asnumpy(a):
    return _np.asarray(a)


def asarray(a, dtype=None):
    return _np.asarray(a, dtype=dtype)


class RawKernel:
    """The reference constructs its CUDA kernels eagerly in each layer's
    ``__init__`` (convolution.py:55) even on the CPU path — accept and hold
    the source, refuse to launch."""

    def __init__(self, code, name=None, **kwargs):
        self.code = code
        self.name = name

    def __call__(self, *args, **kwargs):
        raise RuntimeError("CUDA RawKernel launched under the CPU cupy stub")
