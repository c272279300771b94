"""Convolution / dense ops.

TPU-first design notes
----------------------
The reference implements standard convolution as im2col (Cython/OpenMP on CPU,
a CUDA RawKernel on GPU) followed by a GEMM (reference: layers/convolution.py:58-87),
and depthwise convolution as a direct per-channel loop
(reference: layers/depthwise_convolution.py:66-102). On TPU both lower onto the MXU
through ``lax.conv_general_dilated`` — XLA performs the im2col-as-matmul
transformation itself, tiles onto the 128x128 systolic array and fuses the bias add,
so no hand-written patch extraction is needed or wanted. Pointwise (1x1) conv with
stride>1 keeps the reference's subsample-then-GEMM semantics
(reference: layers/pointwise_convolution.py:46-55 slices ``X[:,:,::s,::s]`` first),
which is mathematically identical to a strided 1x1 conv but cheaper.

Layouts: activations NHWC, weights kept in the reference's layouts and transposed
at trace time (a transpose of a small weight tensor per step, fused by XLA).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from dorknet_tpu.config import get_compute_dtype, get_matmul_precision


def _cast_in(x):
    dt = get_compute_dtype()
    return x.astype(dt) if x.dtype != dt else x


def _pet():
    """preferred_element_type: fp32 accumulation for the fp32 path. For bf16
    compute we let the op emit bf16 (the MXU still accumulates fp32 internally)
    — forcing an fp32 output would make the conv VJP mix a fp32 cotangent with
    bf16 operands, which lax rejects."""
    return jnp.float32 if get_compute_dtype() == jnp.float32 else None


def _cast_out(y):
    """Activations FLOW in the compute dtype: under bf16 policy the conv
    outputs stay bf16 (halving activation HBM traffic through the network);
    batch-norm statistics and the loss still compute in fp32 (ops/norm.py,
    ops/loss.py upcast internally). fp32 policy is unchanged."""
    dt = get_compute_dtype()
    return y.astype(dt) if y.dtype != dt else y


def _bias_add(y, b, bshape):
    """Bias add whose VJP reduces in fp32. The naive ``y + b.astype(y.dtype)``
    makes the bias cotangent a bf16 reduce_sum, which XLA:TPU rejects as
    mixed-precision inside rematerialised (jax.checkpoint) graphs."""
    if y.dtype == jnp.float32:
        return y + b.reshape(bshape)
    return (y.astype(jnp.float32) + b.reshape(bshape)).astype(y.dtype)


def conv2d(x, w_oihw, b=None, stride=1, padding=0):
    """Standard conv. x: (N,H,W,C); w_oihw: (O,I,fh,fw) (reference layout).

    Returns (N,P,Q,O) float32.
    """
    w = jnp.transpose(w_oihw, (2, 3, 1, 0))  # -> HWIO
    y = lax.conv_general_dilated(
        _cast_in(x),
        _cast_in(w),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=_pet(),
        precision=get_matmul_precision(),
    )
    y = _cast_out(y)
    if b is not None:
        y = _bias_add(y, b, (1, 1, 1, -1))
    return y


def _depthwise_grouped(x, w_cfhfw, stride, padding):
    """The grouped-conv primal: (N,H,W,C) x (C,fh,fw) -> (N,P,Q,C)."""
    C = w_cfhfw.shape[0]
    w = jnp.transpose(w_cfhfw, (1, 2, 0))[:, :, None, :]  # (fh,fw,1,C) HWIO
    return _cast_out(lax.conv_general_dilated(
        _cast_in(x),
        _cast_in(w),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        preferred_element_type=_pet(),
        precision=get_matmul_precision(),
    ))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _depthwise_core(x, w_cfhfw, stride, padding):
    return _depthwise_grouped(x, w_cfhfw, stride, padding)


def _depthwise_core_fwd(x, w_cfhfw, stride, padding):
    return (_depthwise_grouped(x, w_cfhfw, stride, padding), (x, w_cfhfw))


def _depthwise_core_bwd(stride, padding, res, dy):
    """dx via XLA's transpose conv (its input-grad partitioning is sound);
    dw as an EXPLICIT per-tap multiply-reduce — the reference's fused
    ``depthwise_backward_direct_cy`` formulation (layers/im2col.pyx:143-178).

    The explicit dw is not (only) style: XLA SPMD mis-partitions the grouped
    conv's WEIGHT gradient under mixed batch/parameter shardings — measured
    exactly 2x / 0.5x (a wrong mesh-axis factor) on jax 0.9.0's 8-device CPU
    mesh, surfacing as FSDP training silently diverging from the
    single-device step (caught by __graft_entry__.dryrun_multichip's
    equality gate). A plain elementwise product + reduction is partitioned
    correctly (batch reduce -> psum), on any mesh.

    Cost: XLA emits one reduce fusion per tap (it does not multi-output-fuse
    the nine shared reads), measured 47.7 vs 27.3 ms on the flagship bf16
    b256 step — which is why depthwise_conv2d only selects this rule under
    ``config.spmd_safe_grads`` (distributed traces), keeping the fast XLA
    dgrad for single-device. Operands stay in the flow dtype (bf16 reads
    under the production policy) with fp32 accumulation via einsum's
    preferred_element_type."""
    x, w_cfhfw = res
    C, fh, fw = w_cfhfw.shape

    _, x_pullback = jax.vjp(
        lambda xx: _depthwise_grouped(xx, w_cfhfw, stride, padding), x)
    dx = x_pullback(dy)[0]

    Ho, Wo = dy.shape[1], dy.shape[2]
    xp = jnp.pad(_cast_in(x), ((0, 0), (padding, padding),
                               (padding, padding), (0, 0)))
    taps = []
    for di in range(fh):
        for dj in range(fw):
            sl = xp[:, di:di + stride * (Ho - 1) + 1:stride,
                    dj:dj + stride * (Wo - 1) + 1:stride, :]
            taps.append(jnp.einsum("bijc,bijc->c", sl, dy,
                                   preferred_element_type=jnp.float32))
    dw = jnp.stack(taps, axis=0).reshape(fh, fw, C).transpose(2, 0, 1)
    return dx, dw.astype(w_cfhfw.dtype)


_depthwise_core.defvjp(_depthwise_core_fwd, _depthwise_core_bwd)


def depthwise_conv2d(x, w_cfhfw, b=None, stride=1, padding=1):
    """Depthwise conv. x: (N,H,W,C); w: (C,fh,fw) (reference layout).

    Lowered via ``feature_group_count=C`` — one MXU-friendly grouped conv instead
    of the reference's per-(batch,channel) scalar loops
    (reference: layers/im2col.pyx:109-139). Gradient rule depends on the
    trace context: single-device traces use XLA autodiff (fastest); under
    ``config.spmd_safe_grads`` (set by the Trainer whenever batch/param
    shardings are configured) the custom VJP with the explicit tap-reduction
    weight gradient is used instead — XLA SPMD mis-partitions the grouped
    dgrad under mixed shardings (see _depthwise_core_bwd; correctness
    requirement, not a preference). With ``config.set_use_pallas(True)`` the
    3x3 stride-1/2 cases (all the flagship's depthwise layers, fp32 or bf16)
    run the fused Pallas kernel (ops/pallas/depthwise.py) with its fused
    custom VJP instead.
    """
    from dorknet_tpu.config import use_pallas, use_spmd_safe_grads

    C = w_cfhfw.shape[0]
    # VMEM bound: the kernel holds one image's padded slab (+ fp32 upcast and
    # accumulator) per channel block in VMEM; large-spatial blocks would fail
    # Mosaic allocation at compile time — fall back to XLA instead. The
    # channel block mirrors pallas/depthwise._block_c exactly: BC = C for
    # C <= 512, else 256 (a min(C,256) model would under-count 256<C<=512 by
    # 2x and admit configs that crash Mosaic instead of falling back).
    _block_c = C if C <= 512 else 256
    _vmem_ok = ((x.shape[1] + 2) * (x.shape[2] + 2) * _block_c * 4
                <= 4 * 1024 * 1024)
    if (use_pallas() and stride in (1, 2) and padding == 1
            and w_cfhfw.shape[1:] == (3, 3)
            and (C <= 512 or C % 256 == 0)  # kernel channel-blocking precondition
            and _vmem_ok
            # sharded traces must NOT take the Pallas path: its custom VJP's
            # SPMD partitioning is unverified, which would reopen the exact
            # silent-wrong-gradient hole spmd_safe_grads closes
            and not use_spmd_safe_grads()
            and jax.default_backend() == "tpu"):
        from dorknet_tpu.ops.pallas.depthwise import depthwise3x3

        y = depthwise3x3(_cast_in(x), w_cfhfw.astype(jnp.float32), stride)
        if b is not None:
            y = _bias_add(y, b, (1, 1, 1, -1))
        return y
    if use_spmd_safe_grads():
        y = _depthwise_core(x, w_cfhfw, stride, padding)
    else:
        y = _depthwise_grouped(x, w_cfhfw, stride, padding)
    if b is not None:
        y = _bias_add(y, b, (1, 1, 1, -1))
    return y


def pointwise_conv2d(x, w_oc, b=None, stride=1):
    """1x1 conv as a single GEMM over (N*H*W, C) @ (C, O).

    Stride>1 keeps the reference's subsample-first semantics
    (reference: layers/pointwise_convolution.py:48-49): output spatial size is
    ceil(H/s), and the backward pass scatters gradients only to the sampled grid
    (autodiff through the slice reproduces that exactly).
    """
    if stride > 1:
        x = x[:, ::stride, ::stride, :]
    y = _cast_out(jnp.dot(_cast_in(x), _cast_in(w_oc.T),
                          preferred_element_type=_pet(),
                          precision=get_matmul_precision()))
    if b is not None:
        y = _bias_add(y, b, (1, 1, 1, -1))
    return y


def dense(x, w_io, b=None):
    """Dense: (N,in) @ (in,out) + b (reference: layers/dense_layer.py:47-55)."""
    y = _cast_out(jnp.dot(_cast_in(x), _cast_in(w_io),
                          preferred_element_type=_pet(),
                          precision=get_matmul_precision()))
    if b is not None:
        y = _bias_add(y, b, (1, -1))
    return y
