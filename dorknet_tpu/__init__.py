"""dorknet_tpu — a TPU-native (JAX/XLA/Pallas) CNN training & inference framework.

A from-scratch rebuild of the capabilities of WJGiles/Dorknet (an "artisanal CNNs"
NumPy/Cython/CuPy library) designed TPU-first:

* the per-layer Python forward/backward dispatch loop of the reference
  (reference: network/feed_forward_network.py:50-70) is traced once into a single
  jitted XLA graph containing forward, autodiff backward, l2 regularisation and the
  optimiser update;
* the reference's Cython+OpenMP / CUDA RawKernel compute kernels
  (reference: layers/im2col.pyx, layers/convolution.py:186-224) become XLA-native
  convolutions on the MXU, with opt-in Pallas kernels for fused hot paths;
* data parallelism is expressed over a `jax.sharding.Mesh` with XLA collectives
  riding ICI — batch-norm statistics become global automatically under jit.

The public object API mirrors the reference so its example scripts run unchanged:
`Layer` subclasses carrying `learned_params` / `non_learned_params` / `grads` dicts,
`FeedForwardNetwork`, optimisers exposing `update_weights()`, h5+json checkpoints.
"""

from dorknet_tpu import config
from dorknet_tpu.config import (
    set_matmul_precision,
    get_matmul_precision,
    set_compute_dtype,
    get_compute_dtype,
    set_use_pallas,
    use_pallas,
)

# Convenience top-level API
from dorknet_tpu.network import FeedForwardNetwork, Trainer
from dorknet_tpu import layers, optimisers, models

__version__ = "0.1.0"

__all__ = [
    "FeedForwardNetwork",
    "Trainer",
    "layers",
    "optimisers",
    "models",
    "config",
    "set_compute_dtype",
    "get_compute_dtype",
    "set_use_pallas",
    "use_pallas",
]
