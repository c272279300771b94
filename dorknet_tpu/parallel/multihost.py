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
    """Join the multi-host runtime (no-op when unconfigured single-host).

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly elsewhere (coordinator 'host:port', process count,
    this process's rank)."""
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_count(), jax.process_index()


def is_main_process():
    """True on exactly one host — gate checkpoint writes / logging with this."""
    return jax.process_index() == 0


def local_batch_slice(global_batch_size):
    """(start, size) of this host's slice of a globally-sharded batch: each
    host feeds its own shard; jax.make_array_from_process_local_data or
    device_put with a NamedSharding assembles the global array."""
    per = global_batch_size // jax.process_count()
    return jax.process_index() * per, per
