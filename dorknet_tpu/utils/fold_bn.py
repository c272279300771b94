"""Batch-norm folding for inference.

At test time BN is an affine map by frozen running stats
(y = gamma*(x-mean)/std + beta, reference layers/batch_norm.py:101-115), so any
conv→BN pair collapses into the conv: W' = W * (gamma/std) per output channel,
b' = beta + (b - mean) * (gamma/std). Folding removes one full HBM read+write
of every activation tensor per BN — a pure win for serving (pair with
InferenceRunner). The reference has no equivalent.

``fold_batch_norms(network)`` returns a NEW network (the original is
untouched) with every eligible Conv/Depthwise/Pointwise + BatchNorm pair
folded, including pairs inside ResidualBlocks. BNs must be initialised
(trained or loaded). Non-conv-adjacent BNs are kept as-is.
"""

import copy

import numpy as np
import jax.numpy as jnp

_FOLDABLE = ("ConvLayer", "DepthwiseConvLayer", "PointwiseConvLayer")


def _scale_into(conv, bn):
    gamma = np.asarray(bn.learned_params["gamma"]).reshape(-1)
    beta = np.asarray(bn.learned_params["beta"]).reshape(-1)
    mean = np.asarray(bn.non_learned_params["running_mean"]).reshape(-1)
    std = np.asarray(bn.non_learned_params["running_std"]).reshape(-1)
    scale = gamma / std  # (out_channels,)

    w = np.asarray(conv.learned_params["weights"])
    kind = type(conv).__name__
    if kind == "ConvLayer":          # (O, I, fh, fw)
        w = w * scale[:, None, None, None]
    elif kind == "DepthwiseConvLayer":  # (C, fh, fw)
        w = w * scale[:, None, None]
    else:                             # PointwiseConvLayer (O, C)
        w = w * scale[:, None]

    b = (np.asarray(conv.learned_params["bias"]) if conv.with_bias
         else np.zeros_like(mean))
    b = beta + (b - mean) * scale

    conv.learned_params["weights"] = jnp.asarray(w)
    conv.learned_params["bias"] = jnp.asarray(b.astype(np.float32))
    if not conv.with_bias:
        conv.with_bias = True
        conv.grads["bias"] = jnp.zeros_like(conv.learned_params["bias"])
    conv._jit_cache = {}


def _fold_list(layers):
    """Fold conv→BN pairs in a layer list; returns the new list."""
    out = []
    i = 0
    while i < len(layers):
        l = layers[i]
        nxt = layers[i + 1] if i + 1 < len(layers) else None
        if (type(l).__name__ in _FOLDABLE and nxt is not None
                and type(nxt).__name__ == "BatchNormLayer"
                and nxt.bn_initialized()):
            _scale_into(l, nxt)
            out.append(l)
            i += 2
        else:
            if type(l).__name__ == "ResidualBlock":
                l.layer_list = _fold_list(l.layer_list)
            out.append(l)
            i += 1
    return out


def _clear_jit_caches(layers):
    """Recursively drop per-layer jit caches (incl. ResidualBlock children) —
    deep-copying populated caches drags dozens of compiled PjitFunction
    objects through deepcopy and retains them for the folded network's
    lifetime. Cleared on the SOURCE before copying (they regenerate on the
    next forward) so the copy never touches them."""
    for l in layers:
        l._jit_cache = {}
        if hasattr(l, "_children"):
            _clear_jit_caches(l._children())


def fold_batch_norms(network):
    """Returns a deep-copied network with conv→BN pairs folded for inference."""
    from dorknet_tpu.network import FeedForwardNetwork

    folded = FeedForwardNetwork(network.name + "_bnfolded")
    _clear_jit_caches(network.layers)
    layers = copy.deepcopy(network.layers)
    folded.layers = _fold_list(layers)
    if network.loss_layer is not None:
        network.loss_layer._jit_cache = {}
    folded.loss_layer = copy.deepcopy(network.loss_layer)
    folded._version += 1
    return folded
