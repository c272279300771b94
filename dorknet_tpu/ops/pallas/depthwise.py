"""Fused depthwise 3x3 convolution (stride 1) with a fused custom VJP.

TPU-native analogue of the reference's direct depthwise kernels — Cython
``depthwise_conv_cy`` / fused ``depthwise_backward_direct_cy``
(layers/im2col.pyx:109-178) and the CUDA forward_conv/backward_conv RawKernels
(layers/depthwise_convolution.py:104-140). The per-(batch,channel) scalar loops
become a VPU kernel: each grid step holds one image's padded (H+2, W+2, BC)
channel slab in VMEM and forms the output as nine shifted multiply-accumulates.

Backward reuses the same structure (the reference's fused bwd computes dw and
dx in one loop nest; here dx is the forward kernel applied to the padded
upstream gradient with the spatially-flipped filter, and dw is a dedicated
nine-tap reduction kernel — each a single HBM pass)."""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # set True in tests on CPU


def _fwd_kernel(x_ref, w_ref, o_ref):
    # x: (1, H+2, W+2, BC), w: (3, 3, BC), o: (1, H, W, BC)
    H = o_ref.shape[1]
    W = o_ref.shape[2]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc += x_ref[:, di:di + H, dj:dj + W, :] * w_ref[di, dj, :]
    o_ref[...] = acc


def _dw_kernel(x_ref, dy_ref, o_ref):
    # x: (1, H+2, W+2, BC), dy: (1, H, W, BC), o: (1, 3*3, BC) per-batch partials
    H = dy_ref.shape[1]
    W = dy_ref.shape[2]
    dy = dy_ref[0]
    for di in range(3):
        for dj in range(3):
            o_ref[0, di * 3 + dj, :] = jnp.sum(
                x_ref[0, di:di + H, dj:dj + W, :] * dy, axis=(0, 1))


def _run_fwd(xpad, w_hwc):
    """xpad: (N, H+2, W+2, C) float32; w_hwc: (3,3,C). Returns (N, H, W, C)."""
    N, Hp, Wp, C = xpad.shape
    H, W = Hp - 2, Wp - 2
    BC = C if C <= 512 else 256
    assert C % BC == 0
    return pl.pallas_call(
        _fwd_kernel,
        grid=(N, C // BC),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, BC), lambda n, c: (n, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, BC), lambda n, c: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, BC), lambda n, c: (n, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * N * H * W * C,
            bytes_accessed=(N * Hp * Wp * C + N * H * W * C) * 4,
            transcendentals=0),
        interpret=_INTERPRET,
    )(xpad, w_hwc)


def _run_dw(xpad, dy):
    N, Hp, Wp, C = xpad.shape
    H, W = Hp - 2, Wp - 2
    BC = C if C <= 512 else 256
    partials = pl.pallas_call(
        _dw_kernel,
        grid=(N, C // BC),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, BC), lambda n, c: (n, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, BC), lambda n, c: (n, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 9, BC), lambda n, c: (n, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 9, C), jnp.float32),
        interpret=_INTERPRET,
    )(xpad, dy)
    return jnp.sum(partials, axis=0).reshape(3, 3, -1)


@jax.custom_vjp
def depthwise3x3(x, w_cfhfw):
    """Depthwise 3x3, stride 1, padding 1. x: (N,H,W,C); w: (C,3,3) (reference
    layout). Returns (N,H,W,C) float32."""
    xpad = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    w_hwc = jnp.transpose(w_cfhfw, (1, 2, 0)).astype(jnp.float32)
    return _run_fwd(xpad, w_hwc)


def _depthwise_fwd(x, w):
    return depthwise3x3(x, w), (x, w)


def _depthwise_bwd(res, g):
    x, w = res
    g = g.astype(jnp.float32)
    # dx = depthwise-correlate g with the spatially-flipped filter
    w_flip = jnp.transpose(w, (1, 2, 0))[::-1, ::-1, :].astype(jnp.float32)
    gpad = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dx = _run_fwd(gpad, w_flip)
    # dw: nine-tap reduction over batch and space (fused, single pass)
    xpad = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw_hwc = _run_dw(xpad, g)  # (3,3,C)
    dw = jnp.transpose(dw_hwc, (2, 0, 1))
    return dx, dw


depthwise3x3.defvjp(_depthwise_fwd, _depthwise_bwd)
