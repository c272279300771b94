"""Model cost analysis: per-layer output shapes, parameter counts, FLOPs and
activation bytes — the roofline bookkeeping behind PERF.md, exposed as a
framework feature (the reference has no model introspection at all; its
closest analogue is printing repr strings).

Shapes come from ``jax.eval_shape`` over each layer's pure ``fapply`` — no
compute, works on any backend."""

import numpy as np
import jax
import jax.numpy as jnp


def _param_count(tree):
    return int(sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(tree)))


def _layer_flops(layer, in_shape, out_shape):
    """Forward multiply-add FLOPs (2*MACs) from layer type + shapes (NHWC)."""
    name = type(layer).__name__
    if name == "ConvLayer":
        n, p, q, o = out_shape
        return 2 * n * p * q * o * layer.filter_chans * layer.f_rows * layer.f_cols
    if name == "DepthwiseConvLayer":
        n, p, q, c = out_shape
        return 2 * n * p * q * c * layer.f_rows * layer.f_cols
    if name == "PointwiseConvLayer":
        n, p, q, o = out_shape
        return 2 * n * p * q * o * layer.num_channels
    if name == "DenseLayer":
        n = in_shape[0]
        return 2 * n * layer.incoming_chans * layer.output_dim
    if name == "ResidualBlock":
        return None  # summed from children by summarize()
    return 0


def _walk(layer, params, state, x, rows, acc, depth=0, prim=None):
    """acc: 1-element list accumulating activation element counts over EVERY
    produced tensor, including ResidualBlock internals and skip branches.

    prim (optional list): flat record of every PRIMITIVE layer in execution
    order as (type_name, layer, in_shape, out_shape, param_count, fwd_flops),
    plus a synthetic ("residual_join", ...) entry per ResidualBlock — the
    per-tensor view roofline() costs from."""
    name = "{}{} ({})".format("  " * depth, layer.layer_name,
                              type(layer).__name__)
    if type(layer).__name__ == "ResidualBlock":
        total = 0
        x_in = x
        h = x
        for i, l in enumerate(layer.layer_list):
            h, f = _walk(l, params["layers"][i], state["layers"][i], h,
                         rows, acc, depth + 1, prim)
            total += f
        if layer.skip_projection is not None:
            _, f = _walk(layer.skip_projection, params["skip"], state["skip"],
                         x_in, rows, acc, depth + 1, prim)
            total += f
        y = h  # post-skip activation preserves shape
        acc[0] += int(np.prod(y.shape))  # the post-join tensor
        rows.append((name, tuple(y.shape), _param_count(params), total))
        if prim is not None:
            prim.append(("residual_join", None, tuple(y.shape),
                         tuple(y.shape), 0, 0))
        return y, total

    y_shape = jax.eval_shape(
        lambda p, s, x_: layer.fapply(p, s, x_, True)[0], params, state, x)
    flops = _layer_flops(layer, x.shape, y_shape.shape) or 0
    acc[0] += int(np.prod(y_shape.shape))
    rows.append((name, tuple(y_shape.shape), _param_count(params), flops))
    if prim is not None:
        prim.append((type(layer).__name__, layer, tuple(x.shape),
                     tuple(y_shape.shape), _param_count(params), flops))
    return jax.ShapeDtypeStruct(y_shape.shape, y_shape.dtype), flops


def summarize(network, input_shape, print_table=True):
    """input_shape: (N, C, H, W) (public NCHW). Returns a dict with per-layer
    rows and totals: params, forward FLOPs, activation bytes (fp32)."""
    n, c, h, w = input_shape
    x = jax.ShapeDtypeStruct((n, h, w, c), jnp.float32)  # internal NHWC
    rows = []
    acc = [int(np.prod(x.shape))]
    for layer, p, s in zip(network.layers, network.gather_params(),
                           network.gather_states()):
        x, _ = _walk(layer, p, s, x, rows, acc)
    act_elems = acc[0]

    total_params = sum(r[2] for r in rows if not r[0].startswith(" "))
    total_flops = sum(r[3] for r in rows if not r[0].startswith(" "))
    result = {
        "rows": rows,
        "total_params": total_params,
        "forward_flops": total_flops,
        "train_flops_estimate": 3 * total_flops,
        "activation_bytes_fp32": act_elems * 4,
    }
    if print_table:
        print("{:<44} {:>20} {:>12} {:>14}".format("layer", "output", "params",
                                                   "fwd FLOPs"))
        for name, shape, params, flops in rows:
            print("{:<44} {:>20} {:>12,} {:>14,}".format(
                name[:44], str(shape), params, flops))
        print("-" * 92)
        print("params: {:,}   forward: {:.3f} GFLOP   train est: {:.3f} GFLOP   "
              "activations: {:.1f} MB (fp32)".format(
                  total_params, total_flops / 1e9, 3 * total_flops / 1e9,
                  act_elems * 4 / 1e6))
    return result


# Per-layer HBM-traffic rules for a fused training step, in units of tensor
# ELEMENT counts (I = input elems, O = output elems, P = param elems), for
# two fusion schedules:
#
# "xla" — the schedule XLA actually emits on TPU, calibrated against the
# Perfetto device trace of the ResNet-50 b128 bf16 step (PERF.md round-4
# roofline session; predicted 44.0 ms vs 44.1 ms measured, and 13.9 ms vs
# 12.3 ms for the flagship):
#   conv-like   fwd reads I + writes O; dgrad reads dO + writes dI;
#               wgrad re-reads dO and I              -> 3*(I+O)
#   batch-norm  one stats pass re-reads the conv output (the trace's
#               convert_reduce fusions); the normalise+ReLU applies are
#               operand-fused into the consuming convs (no HBM round-trip);
#               backward is one multi-output fusion reading dO and x,
#               writing dx, with dgamma/dbeta accumulated in the same pass
#               (the multiply_reduce fusions)         -> 4*O
#   max-pool    fwd reads I, writes O; backward select_and_scatter re-reads
#               I and dO, writes dI                  -> 3*I + 2*O
#   relu        fuses into the BN epilogue / dx fusion -> 0
#   join        residual add reads two branches, writes one; backward
#               fan-out is one more read             -> 4*O
#
# "perfect" — the minimal traffic ANY schedule needs (each inter-fusion
# tensor written once + read once; BN stats computed in the producing conv's
# epilogue; saved activations re-read once for wgrad and once for the BN/ReLU
# backward): conv-like 3*I + 4*O, batch-norm free, join 3*O. This is the true
# speed-of-light; "xla" is the roofline of the schedule the compiler picks.
_ROOFLINE_SCHEDULES = {
    "xla": {
        "conv": lambda i, o: 3 * (i + o),
        "BatchNormLayer": lambda i, o: 4 * o,
        "MaxPoolLayer": lambda i, o: 3 * i + 2 * o,
        "ReLu": lambda i, o: 0,
        "ReshapeLayer": lambda i, o: 0,
        "GlobalAveragePooling": lambda i, o: 2 * (i + o),
        "SoftmaxWithCrossEntropy": lambda i, o: 4 * i,
        "residual_join": lambda i, o: 4 * o,
    },
    "perfect": {
        "conv": lambda i, o: 3 * i + 4 * o,
        "BatchNormLayer": lambda i, o: 0,
        "MaxPoolLayer": lambda i, o: 2 * i + 2 * o,
        "ReLu": lambda i, o: 0,
        "ReshapeLayer": lambda i, o: 0,
        "GlobalAveragePooling": lambda i, o: i + o,
        "SoftmaxWithCrossEntropy": lambda i, o: 2 * i,
        "residual_join": lambda i, o: 3 * o,
    },
}
_WEIGHTED = ("ConvLayer", "PointwiseConvLayer", "DepthwiseConvLayer",
             "DenseLayer")


def roofline(network, input_shape, compute_dtype=jnp.bfloat16,
             peak_tflops=197.0, peak_gbs=820.0, schedule="xla",
             print_table=True):
    """Analytic roofline for one fused TRAINING step on a TPU chip.

    Per primitive layer: time = max(FLOP time, HBM time) where FLOP time is
    3x forward FLOPs (fwd + data-grad + weight-grad convolutions all run on
    the MXU) at ``peak_tflops`` and HBM time is the traffic model above at
    ``peak_gbs``. The per-layer max / global sum is the standard no-overlap
    roofline: it assumes XLA serialises fusions (true on TPU: one core, one
    program) and that each fusion individually runs at the relevant peak.

    ``schedule="xla"`` (default) costs the fusion schedule XLA actually
    emits — measured/sol is then "how close is the program to its own
    bandwidth roofline". ``schedule="perfect"`` costs the minimal traffic
    any schedule needs — measured/sol is then distance from true
    speed-of-light (see _ROOFLINE_SCHEDULES for both rule tables).

    The two peaks default to the v5e: 197 bf16 TFLOP/s MXU, ~820 GB/s HBM.
    Validation against measured device time (PERF.md round-4 session):
    isolated deep 3x3 convs reach 189 TFLOP/s (96% of the FLOP peak), the
    flagship's fused BN passes reach 700-760 GB/s (~90% of the HBM peak),
    and the "xla" schedule predicts the measured ResNet-50 b128 bf16 step
    within 0.3% (44.0 model vs 44.1 ms measured) and the flagship step
    within 12%.

    Weight/optimiser traffic is included (3*P at flow dtype + 5*P fp32 for
    the SGD-momentum update); BN's fp32 upcasts are ignored (reads stay at
    flow dtype in the fused kernels; the fp32 scalars per channel are noise).

    Returns a dict: sol_ms (roofline step time), flops_ms / bytes_ms (pure
    compute / pure bandwidth lower bounds), train_flops, traffic_bytes,
    compute_bound_ms (portion of sol_ms from MXU-limited layers), rows.
    ``attained(measured_ms)``-style numbers are left to the caller:
    MFU = train_flops / measured_s / peak; roofline fraction = sol_ms /
    measured_ms."""
    n, c, h, w = input_shape
    act_bytes = jnp.dtype(compute_dtype).itemsize
    rules = _ROOFLINE_SCHEDULES[schedule]
    x = jax.ShapeDtypeStruct((n, h, w, c), compute_dtype)
    rows, prim = [], []
    acc = [int(np.prod(x.shape))]
    for layer, p, s in zip(network.layers, network.gather_params(),
                           network.gather_states()):
        x, _ = _walk(layer, p, s, x, rows, acc, prim=prim)

    peak_flops = peak_tflops * 1e12
    peak_bw = peak_gbs * 1e9
    out_rows = []
    sol_s = flops_s = bytes_s = 0.0
    compute_bound_s = 0.0
    total_flops = 0
    total_bytes = 0
    for tname, layer, in_shape, out_shape, pcount, fwd_flops in prim:
        i_elems = int(np.prod(in_shape))
        o_elems = int(np.prod(out_shape))
        rule = rules["conv"] if tname in _WEIGHTED else \
            rules.get(tname, rules["conv"])
        traffic = rule(i_elems, o_elems) * act_bytes
        if tname in _WEIGHTED:
            traffic += 3 * pcount * act_bytes + 5 * pcount * 4
        train_flops = 3 * fwd_flops
        t_flop = train_flops / peak_flops
        t_mem = traffic / peak_bw
        t = max(t_flop, t_mem)
        bound = "MXU" if t_flop >= t_mem else "HBM"
        sol_s += t
        flops_s += t_flop
        bytes_s += t_mem
        if bound == "MXU":
            compute_bound_s += t
        total_flops += train_flops
        total_bytes += traffic
        label = layer.layer_name if layer is not None else "residual_join"
        out_rows.append((label, tname, train_flops, traffic, t * 1e3, bound))

    result = {
        "sol_ms": sol_s * 1e3,
        "flops_ms": flops_s * 1e3,
        "bytes_ms": bytes_s * 1e3,
        "train_flops": total_flops,
        "traffic_bytes": total_bytes,
        "compute_bound_ms": compute_bound_s * 1e3,
        "rows": out_rows,
        "peak_tflops": peak_tflops,
        "peak_gbs": peak_gbs,
        "act_dtype_bytes": act_bytes,
        "schedule": schedule,
    }
    if print_table:
        print("{:<28} {:<22} {:>10} {:>9} {:>8}  bound".format(
            "layer", "type", "GFLOP(train)", "MB", "SoL ms"))
        for label, tname, fl, by, ms, bound in out_rows:
            print("{:<28} {:<22} {:>10.2f} {:>9.1f} {:>8.3f}  {}".format(
                label[:28], tname[:22], fl / 1e9, by / 1e6, ms, bound))
        print("-" * 92)
        print("speed-of-light {:.2f} ms/step  (pure-MXU {:.2f} ms, pure-HBM "
              "{:.2f} ms; {:.0f}% of SoL time is MXU-bound)\n"
              "train {:.2f} TFLOP/step, traffic {:.2f} GB/step  @ peaks "
              "{:.0f} TFLOP/s, {:.0f} GB/s".format(
                  result["sol_ms"], result["flops_ms"], result["bytes_ms"],
                  100 * compute_bound_s / max(sol_s, 1e-12),
                  total_flops / 1e12, total_bytes / 1e9,
                  peak_tflops, peak_gbs))
    return result
