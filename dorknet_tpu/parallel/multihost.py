"""Multi-host (pod / multi-slice) support.

One v5e *slice* is driven by multiple host processes, each seeing a subset of
local devices; ``jax.distributed.initialize`` joins them into one logical
runtime where ``jax.devices()`` is global. Everything else in this framework
already speaks that language: ``make_mesh`` builds over global devices, jit
arrays have global semantics (the DP gradient/BN reductions ride ICI within a
slice; across slices XLA routes collectives over DCN), and the Trainer's
sharded batches are assembled per-host from each host's local shard.

This module is the thin process-level glue; it is exercised in CI only at the
API level (single-process) since multi-host needs real pods.
"""

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Join the multi-host runtime.

    With explicit args: joins that coordination service. With no args: lets
    jax auto-detect the cluster from the environment (TPU pod metadata /
    coordinator env vars); if no cluster is detectable (plain single host),
    this is a harmless no-op. Returns (process_count, process_index)."""
    if coordinator_address or (num_processes is not None and num_processes > 1):
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # no cluster detected — single-host run
    return jax.process_count(), jax.process_index()


def is_main_process():
    """True on exactly one host — gate checkpoint writes / logging with this."""
    return jax.process_index() == 0


def local_batch_slice(global_batch_size):
    """(start, size) of this host's slice of a globally-sharded batch: each
    host feeds its own shard; jax.make_array_from_process_local_data or
    device_put with a NamedSharding assembles the global array. The global
    batch must divide evenly (uneven shards cannot form a global array)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            "global_batch_size {} not divisible by process_count {}".format(
                global_batch_size, n))
    per = global_batch_size // n
    return jax.process_index() * per, per
