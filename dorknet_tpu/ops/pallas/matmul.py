"""Tiled MXU matmul — the GEMM behind the Pallas pointwise/dense fast path.

The reference's conv is im2col + GEMM (cp.dot, layers/convolution.py:80-83);
this is that GEMM as a Mosaic kernel: 2-D grid over (M, N) output tiles, the K
contraction resident in VMEM (K <= 512 for every model in the zoo), fp32
accumulation on the 128x128 systolic array."""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                         preferred_element_type=jnp.float32)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def matmul(a, b, bm=256, bn=256, interpret=False):
    """(M,K) @ (K,N) -> (M,N) float32. Pads M/N up to tile multiples."""
    M, K = a.shape
    K2, N = b.shape
    assert K == K2
    bm = min(bm, _round_up(M, 8))
    bn = min(bn, _round_up(N, 128))
    Mp, Np = _round_up(M, bm), _round_up(N, bn)
    if Mp != M:
        a = jnp.pad(a, ((0, Mp - M), (0, 0)))
    if Np != N:
        b = jnp.pad(b, ((0, 0), (0, Np - N)))

    out = pl.pallas_call(
        _matmul_kernel,
        grid=(Mp // bm, Np // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * K,
            bytes_accessed=(Mp * K + K * Np + Mp * Np) * 4,
            transcendentals=0),
        interpret=interpret,
    )(a, b)
    return out[:M, :N]
