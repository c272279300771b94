"""int8 post-training-quantised serving path.

The reference serves in full fp32 (its eval loop is the test-mode forward,
reference network/feed_forward_network.py:72-88). On TPU the MXU multiplies
int8xint8 into int32 at twice the bf16 rate, and int8 activations halve the
HBM traffic of the (memory-bound) CNN families this framework ships — so a
production serving path wants post-training quantisation. This module provides
it TPU-natively:

- **weights**: per-output-channel symmetric int8 (``scale_o = max|W_o| / 127``),
  quantised once at build time from the BN-folded network (utils/fold_bn);
- **activations**: per-tensor symmetric int8, either *dynamic* (the scale is
  ``max|x|/127`` computed on-device inside the same XLA program — one fused
  reduction) or *static* after ``calibrate(batches)`` records per-layer
  absolute maxima (EMA-free running max, the standard PTQ recipe), which lets
  XLA fuse the quantise into the producing op's epilogue;
- **compute**: ``lax.conv_general_dilated`` / ``jnp.dot`` with int8 operands
  and ``preferred_element_type=int32``; the int32 output is rescaled by
  ``s_x * scale_w`` per channel and the (folded) bias is added in fp32.

Non-conv layers (pooling, activations, reshape, any BN that could not fold)
run their ordinary ``fapply`` unchanged; ResidualBlocks are recursed into,
quantising their inner convs and the skip projection. The public API matches
``InferenceRunner`` (predict_probs / predict / predict_iter, fixed-shape
compiled batches with ragged padding).
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dorknet_tpu.config import get_compute_dtype
from dorknet_tpu.layers.base import to_nhwc, to_nchw
from dorknet_tpu.network.inference import InferenceRunner

_QUANT_KINDS = ("ConvLayer", "DepthwiseConvLayer", "PointwiseConvLayer",
                "DenseLayer")
# Depthwise is excluded by default: its conv does ~9 MACs/output (no MXU
# win to speak of) while int8 adds a requantise pass (full read+write of the
# activation) around EVERY depthwise layer — half the flagship's layers.
# Measured on-chip: int8 standard conv/matmul beat bf16 by 1.2-1.3x
# *including* the requantise, but quantising the depthwise layers erased the
# gain in the full graph (PERF.md round-2).
_DEFAULT_QUANT_KINDS = ("ConvLayer", "PointwiseConvLayer", "DenseLayer")
# weight-tensor axes reduced to get one scale per OUTPUT channel, per layout:
# ConvLayer (O,I,fh,fw); DepthwiseConvLayer (C,fh,fw); PointwiseConvLayer
# (O,C); DenseLayer (in,out).
_CHANNEL_AXES = {
    "ConvLayer": (1, 2, 3),
    "DepthwiseConvLayer": (1, 2),
    "PointwiseConvLayer": (1,),
    "DenseLayer": (0,),
}


def _quantize_weight(kind, w):
    """-> (w_int8 in the reference layout, per-output-channel fp32 scales)."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=_CHANNEL_AXES[kind])
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    if kind == "DenseLayer":
        broadcast = scale[None, :]
    else:
        broadcast = scale[(slice(None),) + (None,) * (w.ndim - 1)]
    wq = np.clip(np.rint(w / broadcast), -127, 127).astype(np.int8)
    return wq, scale


class _ActRecorder:
    """Collects each quant node's activation statistic during a calibration
    forward (appended in node order, inside the jitted observe program).

    percentile=None records max|x| — classic abs-max PTQ. A float (e.g. 99.9)
    records jnp.percentile(|x|, percentile) instead: one outlier-heavy
    calibration image under abs-max inflates the static scale for every image
    served afterwards (normal activations collapse onto a few int8 levels);
    the percentile statistic clips the outliers and keeps the scale sized to
    the bulk of the distribution (VERDICT r2 item 7)."""

    def __init__(self, percentile=None):
        if percentile is not None and not (0.0 < float(percentile) <= 100.0):
            raise ValueError(
                "percentile must be in (0, 100], got {}".format(percentile))
        self.percentile = None if percentile is None else float(percentile)
        self.stats = []

    def observe(self, x):
        a = jnp.abs(x.astype(jnp.float32))
        if self.percentile is None:
            self.stats.append(jnp.max(a))
        else:
            self.stats.append(jnp.percentile(a.reshape(-1), self.percentile))


def _act_scale(x, static_scale):
    """Per-tensor activation scale: static (calibrated) or dynamic max|x|."""
    if static_scale is not None:
        return static_scale
    return jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0


def _quantize_act(x, s_x):
    q = jnp.clip(jnp.rint(x.astype(jnp.float32) / s_x), -127.0, 127.0)
    return q.astype(jnp.int8)


def _rescale(y_i32, s_x, scale_w, bias, bshape):
    y = y_i32.astype(jnp.float32) * (s_x * scale_w).reshape(bshape)
    if bias is not None:
        y = y + bias.reshape(bshape)
    return y.astype(get_compute_dtype())


class QuantizedInferenceRunner(InferenceRunner):
    """Drop-in int8 variant of InferenceRunner.

    ``QuantizedInferenceRunner(net, batch_size)`` BN-folds and quantises a
    copy of ``net`` (the original is untouched). Call ``calibrate(batches)``
    with a few representative input batches to switch from dynamic to static
    activation scales (faster: removes one reduction pass per quant layer).
    """

    def __init__(self, network, batch_size, batch_sharding=None, fold_bn=True,
                 quant_kinds=_DEFAULT_QUANT_KINDS, weight_only_kinds=()):
        """quant_kinds selects which layer types run int8; the default skips
        DepthwiseConvLayer (see _DEFAULT_QUANT_KINDS note). Pass
        quant_kinds=_QUANT_KINDS (or an explicit tuple) to quantise
        everything.

        weight_only_kinds lists layer types that get int8 WEIGHT storage but
        flow-dtype compute (no activation quantise/requantise — see
        _make_weight_only). The measured depthwise policy is
        weight_only_kinds=("DepthwiseConvLayer",): same latency as leaving
        dw in bf16, dw weights still ship as int8+scales (PERF.md round-4
        int8-depthwise A/B). A kind in both tuples runs full int8."""
        self._source = network
        self._fold = bool(fold_bn)
        self.batch_size = int(batch_size)
        self.batch_sharding = batch_sharding
        self.quant_kinds = tuple(quant_kinds)
        self.weight_only_kinds = tuple(weight_only_kinds)
        self._build()

    def _build(self):
        from dorknet_tpu.utils.fold_bn import fold_batch_norms

        self._source._require_bn_initialized("QuantizedInferenceRunner")

        if self._fold:
            net = fold_batch_norms(self._source)
        else:
            net = copy.deepcopy(self._source)
            for l in net.layers:
                l._jit_cache = {}
        self.network = net
        self._nodes, qparams = _build_nodes(net.layers, self.quant_kinds,
                                            self.weight_only_kinds)
        self._has_loss = net.loss_layer is not None
        self._params = qparams
        self._states = None
        self._build_jit_only()

    def refresh(self):
        """Re-fold + re-quantise after further training of the source network
        (drops any calibration — re-run calibrate())."""
        self._build()

    # -- static activation scales (PTQ calibration) ------------------------- #
    def calibrate(self, batches, percentile=None):
        """Record a per-quant-layer activation statistic over ``batches``
        (iterable of (N,C,H,W) arrays, any N) and bake static scales. Returns
        the number of scales set.

        percentile=None (default) records max|activation| — exact abs-max PTQ.
        percentile=99.9 (say) records the 99.9th percentile of |activation|
        per batch instead (running max across batches), which is robust to
        outlier-heavy calibration data: a single corrupted/extreme image no
        longer inflates the serving scales for everyone (see _ActRecorder)."""
        nodes = self._nodes

        def observe(qp, X):
            rec = _ActRecorder(percentile)
            x = to_nhwc(X)
            for node, sub in zip(nodes, qp):
                x = node(sub, x, record=rec)
            return jnp.stack(rec.stats) if rec.stats else jnp.zeros((0,))

        fn = jax.jit(observe)
        running = None
        for X in batches:
            X = np.asarray(X, np.float32)
            for i in range(0, X.shape[0], self.batch_size):
                # ragged chunks are observed at their NATURAL size (one extra
                # trace per distinct tail shape — calibration is offline).
                # Earlier versions padded by cycling rows, which is fine for
                # max (duplication-invariant) but distorts the percentile
                # statistic: duplicating a corrupted image's rows up to 10x
                # re-inflates exactly the outlier mass percentile mode exists
                # to clip, and uneven cycling weights rows unequally.
                part = X[i:i + self.batch_size]
                m = np.asarray(fn(self._params, jnp.asarray(part)))
                running = m if running is None else np.maximum(running, m)
        if running is None:
            raise ValueError("calibrate() needs at least one batch")
        scales = [np.float32(max(v, 1e-12) / 127.0) for v in running]
        _set_static_scales(self._params, iter(scales))
        self._build_jit_only()
        return len(scales)

    def get_scales(self):
        """The static activation scales as a list of floats (None entries =
        still dynamic). Persist these (they're a few dozen numbers) so a
        serving process can skip calibration: fp32 checkpoint -> quantise ->
        set_scales(saved)."""
        out = []
        _collect_scales(self._params, out)
        return [None if s is None else float(s) for s in out]

    def set_scales(self, scales):
        """Bake previously-recorded activation scales (from get_scales())."""
        scales = list(scales)
        n_quant = len(self.get_scales())
        if len(scales) != n_quant:
            raise ValueError(
                "got {} scales for {} quantised layers".format(
                    len(scales), n_quant))
        _set_static_scales(self._params, iter(scales))
        self._build_jit_only()

    def _build_jit_only(self):
        from dorknet_tpu.config import trace_signature

        nodes, has_loss = self._nodes, self._has_loss

        def forward(qp, _unused_states, X):
            x = to_nhwc(X)
            for node, sub in zip(nodes, qp):
                x = node(sub, x)
            if has_loss:
                from dorknet_tpu.ops.loss import softmax_probs

                return softmax_probs(x)
            return to_nchw(x)

        # keyed on the policy globals like InferenceRunner._build_jit: a
        # compute-dtype/precision flip after construction retraces (the int8
        # weights are policy-independent; the plain nodes and rescales are not)
        self._sig = trace_signature()
        self._fn = jax.jit(forward)

    def _rebuild_for_policy(self):
        self._build_jit_only()


# --------------------------------------------------------------------------- #
# Node builders: each node is apply(qp, x, record=None) -> y. ``record``
# (calibration) is an _ActRecorder observing this node's |x| BEFORE
# quantisation (abs-max or percentile statistic).
# --------------------------------------------------------------------------- #
def _build_nodes(layers, kinds=_QUANT_KINDS, weight_only_kinds=()):
    nodes, qparams = [], []
    for l in layers:
        kind = type(l).__name__
        if kind == "ResidualBlock":
            node, qp = _make_residual(l, kinds, weight_only_kinds)
        elif kind in kinds and l.learned_params:
            node, qp = _make_quant(l, kind)
        elif kind in weight_only_kinds and kind in _CHANNEL_AXES \
                and l.learned_params:
            node, qp = _make_weight_only(l, kind)
        else:
            node, qp = _make_plain(l)
        nodes.append(node)
        qparams.append(qp)
    return nodes, qparams


def _make_plain(l):
    def apply(qp, x, record=None, _l=l):
        y, _ = _l.fapply(qp["p"], qp["s"], x, False)
        return y

    return apply, {"p": l.get_params(), "s": l.get_state()}


def _make_quant(l, kind):
    wq, scale_w = _quantize_weight(kind, l.learned_params["weights"])
    bias = (np.asarray(l.learned_params["bias"], np.float32)
            if l.with_bias else None)
    stride = getattr(l, "stride", 1)
    padding = getattr(l, "padding", 0)

    # weights are stored pre-transposed into the COMPUTE layout so the serve
    # program carries no per-dispatch weight transpose (the train-path ops
    # transpose at trace time because weights change; serving weights don't)
    if kind == "ConvLayer":
        wq = np.transpose(wq, (2, 3, 1, 0))  # OIHW -> HWIO

        def compute(xq, w):
            return lax.conv_general_dilated(
                xq, w, (stride, stride), [(padding, padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
        bshape, pre = (1, 1, 1, -1), None
    elif kind == "DepthwiseConvLayer":
        C = wq.shape[0]
        wq = np.transpose(wq, (1, 2, 0))[:, :, None, :]  # (fh,fw,1,C)

        def compute(xq, w):
            return lax.conv_general_dilated(
                xq, w, (stride, stride), [(padding, padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C, preferred_element_type=jnp.int32)
        bshape, pre = (1, 1, 1, -1), None
    elif kind == "PointwiseConvLayer":
        wq = np.ascontiguousarray(wq.T)  # (O,C) -> (C,O)

        def compute(xq, w):
            return jnp.dot(xq, w, preferred_element_type=jnp.int32)

        def pre(x):  # reference subsample-first semantics (ops/conv.py:127)
            return x[:, ::stride, ::stride, :] if stride > 1 else x
        bshape = (1, 1, 1, -1)
    else:  # DenseLayer
        def compute(xq, w):
            return jnp.dot(xq, w, preferred_element_type=jnp.int32)
        bshape, pre = (1, -1), None

    qp = {"wq": jnp.asarray(wq), "scale_w": jnp.asarray(scale_w),
          "s_x": None}
    if bias is not None:
        qp["bias"] = jnp.asarray(bias)

    def apply(qp, x, record=None):
        if pre is not None:
            x = pre(x)
        if record is not None:
            record.observe(x)
        s_x = _act_scale(x, qp["s_x"])
        y = compute(_quantize_act(x, s_x), qp["wq"])
        return _rescale(y, s_x, qp["scale_w"], qp.get("bias"), bshape)

    return apply, qp


def _make_weight_only(l, kind):
    """int8 WEIGHTS, flow-dtype compute: per-output-channel int8 weight
    storage dequantised inside the serve program (w ≈ wq·scale, a few KB of
    elementwise work), with the activation flowing through the standard
    bf16/fp32 convolution — no activation quantise/requantise passes at all.

    This is the measured depthwise policy (PERF.md round-4 int8-depthwise
    A/B): full-int8 depthwise erases the int8 serving win because its ~9
    MACs/output carry no MXU advantage while the requantise adds a full
    read+write of the activation around half the flagship's layers; weight-
    only int8 keeps the artifact story (dw weights live as int8 + scales)
    at bf16's latency, and its only error is weight rounding (top-1
    agreement ≈ fp32). No activation scale ⇒ contributes nothing to
    calibrate()/get_scales()."""
    wq, scale_w = _quantize_weight(kind, l.learned_params["weights"])
    bias = (np.asarray(l.learned_params["bias"], np.float32)
            if l.with_bias else None)
    stride = getattr(l, "stride", 1)
    padding = getattr(l, "padding", 0)

    if kind == "ConvLayer":
        wq = np.transpose(wq, (2, 3, 1, 0))  # OIHW -> HWIO
        sshape, bshape, pre = (1, 1, 1, -1), (1, 1, 1, -1), None

        def compute(x, w):
            return lax.conv_general_dilated(
                x, w, (stride, stride), [(padding, padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
    elif kind == "DepthwiseConvLayer":
        C = wq.shape[0]
        wq = np.transpose(wq, (1, 2, 0))[:, :, None, :]  # (fh,fw,1,C)
        sshape, bshape, pre = (1, 1, 1, -1), (1, 1, 1, -1), None

        def compute(x, w):
            return lax.conv_general_dilated(
                x, w, (stride, stride), [(padding, padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
    elif kind == "PointwiseConvLayer":
        wq = np.ascontiguousarray(wq.T)  # (O,C) -> (C,O)
        sshape, bshape = (1, -1), (1, 1, 1, -1)

        def compute(x, w):
            return jnp.dot(x, w)

        def pre(x):  # reference subsample-first semantics (ops/conv.py:127)
            return x[:, ::stride, ::stride, :] if stride > 1 else x
    else:  # DenseLayer
        sshape, bshape, pre = (1, -1), (1, -1), None

        def compute(x, w):
            return jnp.dot(x, w)

    qp = {"wq": jnp.asarray(wq), "scale_w": jnp.asarray(scale_w)}
    if bias is not None:
        qp["bias"] = jnp.asarray(bias)

    def apply(qp, x, record=None):
        if pre is not None:
            x = pre(x)
        dt = x.dtype
        w = qp["wq"].astype(dt) * qp["scale_w"].reshape(sshape).astype(dt)
        y = compute(x, w)
        if "bias" in qp:
            y = y + qp["bias"].reshape(bshape).astype(y.dtype)
        return y.astype(dt)

    return apply, qp


def _make_residual(l, kinds=_QUANT_KINDS, weight_only_kinds=()):
    body_nodes, body_qp = _build_nodes(l.layer_list, kinds, weight_only_kinds)
    if l.skip_projection is not None:
        skip_node, skip_qp = _build_nodes([l.skip_projection], kinds,
                                          weight_only_kinds)
        skip_node, skip_qp = skip_node[0], skip_qp[0]
    else:
        skip_node, skip_qp = None, {}
    act_node, act_qp = _make_plain(l.post_skip_activation)

    def apply(qp, x, record=None):
        h = x
        for node, sub in zip(body_nodes, qp["layers"]):
            h = node(sub, h, record=record)
        skip = x if skip_node is None else skip_node(qp["skip"], x,
                                                    record=record)
        return act_node(qp["act"], h + skip.astype(h.dtype), record=record)

    return apply, {"layers": body_qp, "skip": skip_qp, "act": act_qp}


def _collect_scales(qparams, out):
    """Walk qparams in calibration order, appending each quant node's s_x
    (None while dynamic)."""
    for qp in qparams:
        if isinstance(qp, dict) and "layers" in qp:  # residual
            _collect_scales(qp["layers"], out)
            if qp["skip"]:
                _collect_scales([qp["skip"]], out)
        elif isinstance(qp, dict) and "s_x" in qp:
            # weight-only nodes carry wq but no s_x — no activation scale
            out.append(qp["s_x"])


def _set_static_scales(qparams, scale_iter):
    """Walk qparams in the order calibration recorded maxes (body before
    skip, the _make_residual apply order), setting s_x on every quant node."""
    for qp in qparams:
        if isinstance(qp, dict) and "layers" in qp:  # residual
            _set_static_scales(qp["layers"], scale_iter)
            if qp["skip"]:
                _set_static_scales([qp["skip"]], scale_iter)
            # act is plain — no scale
        elif isinstance(qp, dict) and "s_x" in qp:
            s = next(scale_iter)
            qp["s_x"] = None if s is None else jnp.float32(s)
