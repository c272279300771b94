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


def _walk(layer, params, state, x, rows, acc, depth=0):
    """acc: 1-element list accumulating activation element counts over EVERY
    produced tensor, including ResidualBlock internals and skip branches."""
    name = "{}{} ({})".format("  " * depth, layer.layer_name,
                              type(layer).__name__)
    if type(layer).__name__ == "ResidualBlock":
        total = 0
        x_in = x
        h = x
        for i, l in enumerate(layer.layer_list):
            h, f = _walk(l, params["layers"][i], state["layers"][i], h,
                         rows, acc, depth + 1)
            total += f
        if layer.skip_projection is not None:
            _, f = _walk(layer.skip_projection, params["skip"], state["skip"],
                         x_in, rows, acc, depth + 1)
            total += f
        y = h  # post-skip activation preserves shape
        acc[0] += int(np.prod(y.shape))  # the post-join tensor
        rows.append((name, tuple(y.shape), _param_count(params), total))
        return y, total

    y_shape = jax.eval_shape(
        lambda p, s, x_: layer.fapply(p, s, x_, True)[0], params, state, x)
    flops = _layer_flops(layer, x.shape, y_shape.shape) or 0
    acc[0] += int(np.prod(y_shape.shape))
    rows.append((name, tuple(y_shape.shape), _param_count(params), flops))
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
