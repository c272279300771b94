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


_DW_CP_CACHE = {}


def _mesh_axes_of(spec_entry):
    """Flatten a PartitionSpec entry (None | name | tuple of names) to a tuple
    of mesh-axis names."""
    if spec_entry is None:
        return ()
    if isinstance(spec_entry, (tuple, list)):
        return tuple(a for a in spec_entry if a is not None)
    return (spec_entry,)


def _dw_filter_grad_cp(stride, padding):
    """The SPMD-correct AND fast depthwise filter gradient: a
    ``custom_partitioning`` rule around XLA's own grouped filter-grad conv.

    Why this exists: XLA SPMD mis-partitions the grouped-conv WEIGHT gradient
    under mixed batch/param shardings (exactly 2x/0.5x wrong — see
    ``_depthwise_core_bwd``). The first workaround (the per-tap
    multiply-reduce, kept as ``spmd_dw_rule="taps"``) partitions correctly but
    costs +39% backward-dw: XLA emits one reduce fusion per tap, rereading the
    activation slab nine times. This rule instead BYPASSES the buggy
    partitioner: per shard it runs exactly the program single-device autodiff
    runs — ``jax.vjp`` of the local grouped conv, i.e. XLA's fused dgrad over
    the shard's batch/channels — then one explicit ``lax.psum`` over whatever
    mesh axes shard the batch dim. Correct by construction on any mesh, at
    single-device speed.

    Sharding contract (the Shardy rule + ``partition`` callback agree):
    batch is a reduction factor (psum'd in the lowering), spatial dims are
    replicated (no halo exchange is attempted), and the CHANNEL dim is a
    passthrough factor shared by x/dy/w/dw — depthwise is per-channel, so
    channel-sharded operands (tensor parallelism) keep their sharding with no
    all-gather and the returned dw stays channel-sharded.

    One ``custom_partitioning`` object per (stride, padding) — they are static
    properties of the conv; shapes/dtypes specialise per trace as usual.
    """
    key = (stride, padding)
    if key in _DW_CP_CACHE:
        return _DW_CP_CACHE[key]

    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _local_dw(x, dy, w_cfhfw):
        # vjp at w of the SAME primal the forward ran: emits XLA's fused
        # grouped filter-grad conv (the conv is linear in w, so the point of
        # linearisation is irrelevant; w supplies shape/dtype/layout)
        _, pullback = jax.vjp(
            lambda w: _depthwise_grouped(x, w, stride, padding), w_cfhfw)
        return pullback(dy)[0]

    @custom_partitioning
    def dw_cp(x, dy, w_cfhfw):
        return _local_dw(x, dy, w_cfhfw)

    def _specs_from_x(arg_shapes):
        x_spec = arg_shapes[0].sharding.spec
        spec_b = x_spec[0] if len(x_spec) > 0 else None
        spec_c = x_spec[3] if len(x_spec) > 3 else None
        return spec_b, spec_c

    def infer_sharding(mesh, arg_shapes, result_shape):
        _, spec_c = _specs_from_x(arg_shapes)
        return NamedSharding(mesh, P(spec_c))

    def partition(mesh, arg_shapes, result_shape):
        spec_b, spec_c = _specs_from_x(arg_shapes)
        batch_axes = _mesh_axes_of(spec_b)
        act_sh = NamedSharding(mesh, P(spec_b, None, None, spec_c))
        arg_sh = (act_sh, act_sh, NamedSharding(mesh, P(spec_c)))
        out_sh = NamedSharding(mesh, P(spec_c))

        def lower(x, dy, w_cfhfw):
            local = _local_dw(x, dy, w_cfhfw)
            if batch_axes:
                local = lax.psum(local, batch_axes)
            return local

        return mesh, lower, out_sh, arg_sh

    dw_cp.def_partition(
        infer_sharding_from_operands=infer_sharding,
        partition=partition,
        # factors: b=batch (reduced), i/j + p/q = input/output spatial and
        # k/l + x/y = filter taps (all replicated), c=channels (passthrough).
        # need_replication_factors must be listed in first-appearance order.
        sharding_rule="b i j c, b p q c, c k l -> c x y",
        reduction_factors=("b",),
        need_replication_factors=("i", "j", "p", "q", "k", "l", "x", "y"))
    _DW_CP_CACHE[key] = dw_cp
    return dw_cp


def _dw_taps(x, dy, w_cfhfw, stride, padding):
    """The explicit per-tap multiply-reduce dw — the reference's fused
    ``depthwise_backward_direct_cy`` formulation (layers/im2col.pyx:143-178).
    Plain elementwise products + reductions partition correctly on any mesh
    with no custom rules; the fallback/oracle for ``_dw_filter_grad_cp``."""
    C, fh, fw = w_cfhfw.shape
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
    return dw.astype(w_cfhfw.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _depthwise_core(x, w_cfhfw, stride, padding):
    return _depthwise_grouped(x, w_cfhfw, stride, padding)


def _depthwise_core_fwd(x, w_cfhfw, stride, padding):
    return (_depthwise_grouped(x, w_cfhfw, stride, padding), (x, w_cfhfw))


def _depthwise_core_bwd(stride, padding, res, dy):
    """SPMD-safe depthwise backward. dx via XLA's transpose conv (its
    input-grad partitioning is sound). dw must NOT come from XLA autodiff:
    XLA SPMD mis-partitions the grouped conv's WEIGHT gradient under mixed
    batch/parameter shardings — measured exactly 2x / 0.5x (a wrong
    mesh-axis factor) on jax 0.9.0's 8-device CPU mesh, surfacing as FSDP
    training silently diverging from the single-device step (caught by
    __graft_entry__.dryrun_multichip's equality gate).

    Two safe dw rules, selected by ``config.set_spmd_dw_rule``:

    - ``"conv"`` (default): ``_dw_filter_grad_cp`` — a custom_partitioning
      rule that runs XLA's fast fused filter-grad conv per shard and psums
      over the batch mesh axes. Same speed as the (buggy) autodiff path.
    - ``"taps"``: ``_dw_taps`` — explicit per-tap multiply-reduce (the
      reference's fused ``depthwise_backward_direct_cy`` formulation). No
      custom partitioning rules, but +39% backward-dw: XLA emits one reduce
      fusion per tap (47.7 vs 27.3 ms on the flagship bf16 b256 step), which
      is why these rules are only selected under ``config.spmd_safe_grads``
      (distributed traces); single-device traces keep plain XLA autodiff."""
    from dorknet_tpu.config import get_spmd_dw_rule

    x, w_cfhfw = res

    _, x_pullback = jax.vjp(
        lambda xx: _depthwise_grouped(xx, w_cfhfw, stride, padding), x)
    dx = x_pullback(dy)[0]

    if get_spmd_dw_rule() == "conv":
        dw = _dw_filter_grad_cp(stride, padding)(x, dy, w_cfhfw)
    else:
        dw = _dw_taps(x, dy, w_cfhfw, stride, padding)
    return dx, dw


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
