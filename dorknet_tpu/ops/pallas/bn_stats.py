"""Fused single-pass batch-norm statistics.

TPU-native analogue of the reference's Cython two-pass
``channelwise_mean_and_var_4d`` (layers/batch_norm_stats_cy.pyx:17-47): one
streaming pass over the activations accumulating per-channel sum and
sum-of-squares in a VMEM-resident accumulator block (revisited across grid
steps), giving mean and (biased) variance with a single HBM read of the tensor
instead of two."""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    x = x_ref[...]
    # accumulate into row 0 of the (8, C) accumulator block (the 8-row shape
    # satisfies the fp32 sublane tiling; rows 1..7 stay zero)
    sum_ref[0:1, :] += jnp.sum(x, axis=0, keepdims=True)
    sq_ref[0:1, :] += jnp.sum(x * x, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def batch_norm_stats(x, interpret=False):
    """x: (..., C) any leading dims. Returns (mean, var) each (C,), var biased
    (matching np.var / the reference, layers/batch_norm.py:64-65)."""
    C = x.shape[-1]
    xm = x.reshape(-1, C)
    M = xm.shape[0]
    BM = 512
    G = pl.cdiv(M, BM)
    pad = G * BM - M
    if pad:
        xm = jnp.pad(xm, ((0, pad), (0, 0)))  # zeros contribute 0 to both sums

    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((BM, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((8, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, C), lambda i: (0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((8, C), jnp.float32),
                   jax.ShapeDtypeStruct((8, C), jnp.float32)),
        interpret=interpret,
    )(xm.astype(jnp.float32))
    s = sums[0]
    ss = sqs[0]
    mean = s / M
    var = ss / M - mean * mean
    return mean, jnp.maximum(var, 0.0)
