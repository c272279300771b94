"""HDF5 checkpoint helpers reproducing the reference's byte format.

Schema per layer (reference: layers/convolution.py:226-281 and peers):
  <layer_name>/layer_info     scalar float32 dataset whose *attrs* carry the layer
                              type name and hyperparameters
  <layer_name>/weights        (+ attrs weight_regulariser_type/strength if set)
  <layer_name>/bias           (if with_bias)
  <layer_name>/grads/weights, <layer_name>/grads/bias   (if save_grads)
BatchNorm stores gamma/beta/running_mean/running_std instead
(reference: layers/batch_norm.py:176-232); ResidualBlock recurses into children
(reference: layers/residual_block.py:99-114).
"""

import numpy as np


def to_np(x):
    return np.asarray(x)


def create_layer_info(open_f, layer_name, type_name, **attrs):
    base = open_f.create_dataset(layer_name + "/layer_info", dtype=np.float32)
    base.attrs["type"] = type_name
    for k, v in attrs.items():
        base.attrs[k] = v
    return base


def save_array(open_f, path, arr):
    arr = to_np(arr)
    dset = open_f.create_dataset(path, arr.shape, dtype=arr.dtype)
    if arr.shape == ():
        dset[()] = arr
    else:
        dset[:] = arr
    return dset


def attach_regulariser_attrs(dset, regulariser):
    if regulariser is not None:
        # The reference wrote np.string_(...) — byte strings — keep that format.
        dset.attrs["weight_regulariser_type"] = np.bytes_(regulariser.type)
        dset.attrs["weight_regulariser_strength"] = np.bytes_(str(regulariser.strength))


def load_regulariser(dset):
    """Reconstruct the regulariser from weights-dataset attrs
    (reference: layers/convolution.py:264-268)."""
    from dorknet_tpu.regularisers.l2 import l2

    reg_type = dset.attrs.get("weight_regulariser_type", None)
    if reg_type is not None:
        strength = float(dset.attrs["weight_regulariser_strength"])
        if reg_type in (b"l2", "l2"):
            return l2(strength=strength)
    return None


def save_param_datasets(open_f, layer_name, learned_params, grads,
                        weight_regulariser, with_bias, save_grads=True):
    """The common weights/bias/grads block shared by conv/pointwise/dense layers."""
    dset = save_array(open_f, layer_name + "/weights", learned_params["weights"])
    attach_regulariser_attrs(dset, weight_regulariser)
    if with_bias:
        save_array(open_f, layer_name + "/bias", learned_params["bias"])
    if save_grads:
        save_array(open_f, layer_name + "/grads/weights", grads["weights"])
        if with_bias:
            save_array(open_f, layer_name + "/grads/bias", grads["bias"])


def load_param_datasets(open_f, layer_name, learned_params, grads, with_bias,
                        load_grads=True):
    """Counterpart of save_param_datasets: the common weights/bias/grads load
    block shared by conv/depthwise/pointwise/dense layers. Returns the
    regulariser attached to the weights dataset."""
    import jax.numpy as jnp

    reg = load_regulariser(open_f[layer_name + "/weights"])
    learned_params["weights"] = jnp.asarray(open_f[layer_name + "/weights"][:])
    if with_bias:
        learned_params["bias"] = jnp.asarray(open_f[layer_name + "/bias"][:])
    if load_grads:
        grads["weights"] = jnp.asarray(open_f[layer_name + "/grads/weights"][:])
        if with_bias:
            grads["bias"] = jnp.asarray(open_f[layer_name + "/grads/bias"][:])
    return reg
