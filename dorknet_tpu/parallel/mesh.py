"""Device mesh + sharding helpers — the framework's distributed story.

The reference is single-process single-device; its only parallelism is OpenMP
``prange``/CUDA thread grids inside kernels (SURVEY §2.7). The TPU-native design
scales through ``jax.sharding`` instead of a hand-rolled transport:

* **Data parallel (DP)** — shard the batch over a ``data`` mesh axis. Because
  jitted arrays have global semantics, every ``jnp.mean`` over the batch (loss,
  batch-norm statistics) IS the cross-replica mean: XLA inserts the
  psum/all-reduce over ICI automatically, which gives synchronised
  (cross-replica) batch norm for free, and gradient all-reduce likewise.
* **Tensor/model parallel (TP)** — shard output-channel dimensions of the
  weight tensors over a ``model`` axis; XLA propagates activation shardings and
  inserts the boundary collectives. Useful for very wide stretch configs.
* **Pipeline (PP), sequence/context (SP/CP) and expert (EP) parallelism are
  N/A by construction** for this framework: a CNN layer zoo with no sequence
  axis, no experts, and models that fit comfortably on one chip (SURVEY §2.7,
  §5). The mesh interface would carry them (extra axes) if a stretch model
  needed it.

Everything here works identically on a real multi-chip slice and on virtual CPU
devices (``--xla_force_host_platform_device_count=N``), which is how the test
suite and the driver's dry-run validate multi-chip behaviour without a pod.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import mesh_utils


def make_mesh(axes, devices=None):
    """Build a Mesh from {"axis_name": size}. Sizes must multiply to the device
    count being used (pass devices to use a subset)."""
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if devices is None:
        n = int(np.prod(shape))
        devices = jax.devices()[:n]
    dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(dev_array, names)


def batch_sharding(mesh, axis="data"):
    """Shard dim 0 (batch) over ``axis``; all other dims replicated. Works for
    any rank because trailing dims default to replicated in a PartitionSpec."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _tp_spec_for(path_hint, arr, axis):
    """Partition the output-channel dim of weight tensors over ``axis``.

    Reference weight layouts: conv (O,I,fh,fw) → shard O; depthwise (C,fh,fw) →
    shard C; pointwise (O,C) → shard O; dense (in,out) → shard out; 1-D bias /
    BN (broadcast-shaped) params stay replicated (tiny)."""
    if arr.ndim == 4:
        return P(axis, None, None, None)
    if arr.ndim == 3:
        return P(axis, None, None)
    if arr.ndim == 2:
        if path_hint == "dense":
            return P(None, axis)
        return P(axis, None)
    return P()


def model_parallel_param_shardings(network, mesh, axis="model"):
    """NamedSharding pytree for network.gather_params() with TP over ``axis``.

    Only weights whose sharded dim divides the axis size are split; everything
    else is replicated (XLA handles mixed layouts fine)."""
    axis_size = mesh.shape[axis]

    def spec_for_layer(layer, params):
        from dorknet_tpu.layers.residual_block import ResidualBlock
        from dorknet_tpu.layers.dense_layer import DenseLayer

        if isinstance(layer, ResidualBlock):
            return {
                "layers": [spec_for_layer(l, p)
                           for l, p in zip(layer.layer_list, params["layers"])],
                "skip": (spec_for_layer(layer.skip_projection, params["skip"])
                         if layer.skip_projection is not None else {}),
                "act": {},
            }
        out = {}
        hint = "dense" if isinstance(layer, DenseLayer) else "conv"
        for k, v in params.items():
            if k == "weights":
                spec = _tp_spec_for(hint, v, axis)
                dim = [i for i, s in enumerate(spec) if s == axis]
                if dim and v.shape[dim[0]] % axis_size == 0:
                    out[k] = NamedSharding(mesh, spec)
                    continue
            out[k] = NamedSharding(mesh, P())
        return out

    return [spec_for_layer(l, p)
            for l, p in zip(network.layers, network.gather_params())]


def shard_network_params(network, shardings):
    """device_put every layer's params per the sharding pytree (in place)."""
    placed = jax.device_put(network.gather_params(), shardings)
    for l, p in zip(network.layers, placed):
        l.set_params(p)
