"""Fused depthwise 3x3 convolution (stride 1 or 2) with a fused custom VJP.

TPU-native analogue of the reference's direct depthwise kernels — Cython
``depthwise_conv_cy`` / fused ``depthwise_backward_direct_cy``
(layers/im2col.pyx:109-178) and the CUDA forward_conv/backward_conv RawKernels
(layers/depthwise_convolution.py:104-140). The per-(batch,channel) scalar loops
become a VPU kernel: each grid step holds one image's padded (H+2, W+2, BC)
channel slab in VMEM and forms the output as nine shifted multiply-accumulates.

Stride 2: Mosaic cannot extract stride-2 vector slices in-register (verified:
'vector.extract_strided_slice' strides confined to [1,2)), so the padded input
is pre-split into four even/odd phase planes P[a][b][i,j] = xpad[2i+a, 2j+b]
with XLA-level strided slices (fusable into the producer); the nine taps then
become UNIT-stride shifted MACs over the phases.

Accumulation is always fp32; inputs/outputs flow in the compute dtype (bf16
under the production policy), and the weight stays fp32 inside the kernel.

Backward reuses the same structure (the reference's fused bwd computes dw and
dx in one loop nest; here dx is the forward kernel applied to the padded —
and, for stride 2, zero-dilated — upstream gradient with the spatially-flipped
filter, and dw is a dedicated nine-tap reduction kernel — each a single HBM
pass)."""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # set True in tests on CPU


def _out_hw(H, W, stride):
    # pad=1, k=3: H_out = floor((H + 2 - 3) / s) + 1
    return (H - 1) // stride + 1, (W - 1) // stride + 1


# tap (di,dj) reads phase (di%2, dj%2) at offset (di//2, dj//2) — stride 2
_PHASE = {(a, b): i for i, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))}


def _fwd_kernel(x_ref, w_ref, o_ref):
    # stride 1. x: (1, Hp, Wp, BC), w: (3, 3, BC) fp32, o: (1, Ho, Wo, BC)
    Ho, Wo = o_ref.shape[1], o_ref.shape[2]
    x = x_ref[...].astype(jnp.float32)
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc += x[:, di:di + Ho, dj:dj + Wo, :] * w_ref[di, dj, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def _fwd2_kernel(p00_ref, p01_ref, p10_ref, p11_ref, w_ref, o_ref):
    # stride 2 over phase planes, each (1, Ho+1, Wo+1, BC)
    Ho, Wo = o_ref.shape[1], o_ref.shape[2]
    ps = [r[...].astype(jnp.float32) for r in (p00_ref, p01_ref, p10_ref, p11_ref)]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for di in range(3):
        for dj in range(3):
            p = ps[_PHASE[(di % 2, dj % 2)]]
            oi, oj = di // 2, dj // 2
            acc += p[:, oi:oi + Ho, oj:oj + Wo, :] * w_ref[di, dj, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def _dw_kernel(x_ref, dy_ref, o_ref):
    # stride 1. x: (1, Hp, Wp, BC), dy: (1, Ho, Wo, BC), o: (1, 9, BC)
    Ho, Wo = dy_ref.shape[1], dy_ref.shape[2]
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    for di in range(3):
        for dj in range(3):
            o_ref[0, di * 3 + dj, :] = jnp.sum(
                x[:, di:di + Ho, dj:dj + Wo, :] * dy, axis=(0, 1, 2))


def _dw2_kernel(p00_ref, p01_ref, p10_ref, p11_ref, dy_ref, o_ref):
    # stride 2: per-batch dw partials from the phase planes
    Ho, Wo = dy_ref.shape[1], dy_ref.shape[2]
    ps = [r[...].astype(jnp.float32) for r in (p00_ref, p01_ref, p10_ref, p11_ref)]
    dy = dy_ref[...].astype(jnp.float32)
    for di in range(3):
        for dj in range(3):
            p = ps[_PHASE[(di % 2, dj % 2)]]
            oi, oj = di // 2, dj // 2
            o_ref[0, di * 3 + dj, :] = jnp.sum(
                p[:, oi:oi + Ho, oj:oj + Wo, :] * dy, axis=(0, 1, 2))


def _block_c(C):
    BC = C if C <= 512 else 256
    assert C % BC == 0
    return BC


def _phases(xpad, Ho, Wo):
    """Four (N, Ho+1, Wo+1, C) phase planes from (N, Hp, Wp, C) — XLA strided
    slices (+ zero pad on the short odd phases), fusable, no gather."""
    N, Hp, Wp, C = xpad.shape
    out = []
    for a in (0, 1):
        for b in (0, 1):
            nrows = Ho + 1 if a == 0 else min(Ho + 1, (Hp - a + 1) // 2)
            ncols = Wo + 1 if b == 0 else min(Wo + 1, (Wp - b + 1) // 2)
            p = lax.slice(xpad, (0, a, b, 0),
                          (N, a + 2 * (nrows - 1) + 1, b + 2 * (ncols - 1) + 1, C),
                          (1, 2, 2, 1))
            if nrows < Ho + 1 or ncols < Wo + 1:
                p = jnp.pad(p, ((0, 0), (0, Ho + 1 - nrows),
                                (0, Wo + 1 - ncols), (0, 0)))
            out.append(p)
    return out


def _run_fwd(xpad, w_hwc, stride, out_dtype):
    """xpad: (N, H+2, W+2, C); w_hwc: (3,3,C) fp32. Returns (N, Ho, Wo, C)."""
    N, Hp, Wp, C = xpad.shape
    Ho, Wo = _out_hw(Hp - 2, Wp - 2, stride)
    BC = _block_c(C)
    itemsize = jnp.dtype(out_dtype).itemsize
    cost = pl.CostEstimate(
        flops=2 * 9 * N * Ho * Wo * C,
        bytes_accessed=(N * Hp * Wp * C + N * Ho * Wo * C) * itemsize,
        transcendentals=0)
    w_spec = pl.BlockSpec((3, 3, BC), lambda n, c: (0, 0, c),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, Ho, Wo, BC), lambda n, c: (n, 0, 0, c),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((N, Ho, Wo, C), out_dtype)
    if stride == 1:
        return pl.pallas_call(
            _fwd_kernel,
            grid=(N, C // BC),
            in_specs=[
                pl.BlockSpec((1, Hp, Wp, BC), lambda n, c: (n, 0, 0, c),
                             memory_space=pltpu.VMEM),
                w_spec,
            ],
            out_specs=out_spec, out_shape=out_shape,
            cost_estimate=cost, interpret=_INTERPRET,
        )(xpad, w_hwc)
    assert stride == 2
    phases = _phases(xpad, Ho, Wo)
    p_spec = pl.BlockSpec((1, Ho + 1, Wo + 1, BC), lambda n, c: (n, 0, 0, c),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd2_kernel,
        grid=(N, C // BC),
        in_specs=[p_spec] * 4 + [w_spec],
        out_specs=out_spec, out_shape=out_shape,
        cost_estimate=cost, interpret=_INTERPRET,
    )(*phases, w_hwc)


def _run_dw(xpad, dy, stride):
    N, Hp, Wp, C = xpad.shape
    Ho, Wo = dy.shape[1], dy.shape[2]
    BC = _block_c(C)
    dy_spec = pl.BlockSpec((1, Ho, Wo, BC), lambda n, c: (n, 0, 0, c),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 9, BC), lambda n, c: (n, 0, c),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((N, 9, C), jnp.float32)
    if stride == 1:
        partials = pl.pallas_call(
            _dw_kernel,
            grid=(N, C // BC),
            in_specs=[
                pl.BlockSpec((1, Hp, Wp, BC), lambda n, c: (n, 0, 0, c),
                             memory_space=pltpu.VMEM),
                dy_spec,
            ],
            out_specs=out_spec, out_shape=out_shape, interpret=_INTERPRET,
        )(xpad, dy)
    else:
        phases = _phases(xpad, Ho, Wo)
        p_spec = pl.BlockSpec((1, Ho + 1, Wo + 1, BC), lambda n, c: (n, 0, 0, c),
                              memory_space=pltpu.VMEM)
        partials = pl.pallas_call(
            _dw2_kernel,
            grid=(N, C // BC),
            in_specs=[p_spec] * 4 + [dy_spec],
            out_specs=out_spec, out_shape=out_shape, interpret=_INTERPRET,
        )(*phases, dy)
    return jnp.sum(partials, axis=0).reshape(3, 3, -1)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise3x3(x, w_cfhfw, stride=1):
    """Depthwise 3x3, padding 1, stride 1 or 2. x: (N,H,W,C); w: (C,3,3)
    (reference layout, fp32). Output dtype follows x (bf16 flows bf16, with
    fp32 accumulation inside the kernel)."""
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w_hwc = jnp.transpose(w_cfhfw, (1, 2, 0)).astype(jnp.float32)
    return _run_fwd(xpad, w_hwc, stride, x.dtype)


def _depthwise_fwd(x, w, stride):
    return depthwise3x3(x, w, stride), (x, w)


def _depthwise_bwd(stride, res, g):
    x, w = res
    w_flip = jnp.transpose(w, (1, 2, 0))[::-1, ::-1, :].astype(jnp.float32)
    if stride == 1:
        gd = g
    else:
        # transpose of the strided conv: zero-dilate g back onto the x grid
        N, Ho, Wo, C = g.shape
        H, W = x.shape[1], x.shape[2]
        gd = jnp.zeros((N, H, W, C), g.dtype)
        gd = gd.at[:, ::stride, ::stride, :].set(
            g[:, :(H - 1) // stride + 1, :(W - 1) // stride + 1, :])
    gpad = jnp.pad(gd, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dx = _run_fwd(gpad, w_flip, 1, x.dtype)
    # dw: nine-tap reduction over batch and space (fused, single pass)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw_hwc = _run_dw(xpad, g, stride)  # (3,3,C) fp32
    dw = jnp.transpose(dw_hwc, (2, 0, 1)).astype(w.dtype)
    return dx, dw


depthwise3x3.defvjp(_depthwise_fwd, _depthwise_bwd)
