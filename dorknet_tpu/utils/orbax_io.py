"""Orbax checkpointing option — the TPU-idiomatic alternative to the canonical
h5+json format (utils/h5io.py, which remains byte-compatible with the
reference). Orbax gives atomic, async-friendly, sharding-aware checkpoints of
the full pytree (params + BN state + optimiser cache) for production runs;
use h5 when interchange with reference-style tooling matters."""

import os


def _state_tree(network, trainer=None):
    tree = {
        "params": network.gather_params(),
        "states": network.gather_states(),
    }
    if trainer is not None and trainer._cache is not None:
        tree["opt_cache"] = trainer._cache
    return tree


def save_checkpoint(path, network, trainer=None):
    """Save params/BN state (and optimiser cache when a Trainer is given)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _state_tree(network, trainer))
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path, network, trainer=None):
    """Restore into an already-constructed network (the structure carrier),
    mirroring the reference's build-empty-then-load flow.

    Restores WITHOUT a structural target so a checkpoint that carries an
    optimiser cache loads into a fresh (cache-less) trainer and vice versa —
    whatever subset of {params, states, opt_cache} is on disk is applied.
    NB: target-less restore places arrays with default (unsharded) layout;
    re-apply mesh shardings afterwards via parallel.shard_network_params."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    for l, p in zip(network.layers, restored["params"]):
        l.set_params(p)
    network.scatter_states(restored["states"])
    if trainer is not None and restored.get("opt_cache") is not None:
        trainer._cache = restored["opt_cache"]
    return network
