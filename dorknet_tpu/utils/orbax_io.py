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
    if trainer is not None and getattr(trainer, "_ema", None) is not None:
        tree["ema"] = trainer._ema
    return tree


def save_checkpoint(path, network, trainer=None):
    """Save params/BN state (and optimiser cache when a Trainer is given)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _state_tree(network, trainer))
    ckptr.wait_until_finished()
    return path


_ASYNC_CKPTR = None


def save_checkpoint_async(path, network, trainer=None):
    """Non-blocking save: device→host transfer completes before this returns
    (so the next train step may DONATE the param buffers safely — the
    snapshot is already on the host), while serialisation + disk write run in
    a background thread. Returns the shared AsyncCheckpointer; call
    ``wait_until_finished()`` on it before process exit. A save already in
    flight is waited for first, so steady-state overlaps exactly one
    checkpoint write with training — the standard TPU-production cadence
    (checkpoint I/O costs zero step time unless writes are slower than the
    checkpoint interval)."""
    import orbax.checkpoint as ocp

    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    _ASYNC_CKPTR.wait_until_finished()
    _ASYNC_CKPTR.save(os.path.abspath(path), _state_tree(network, trainer))
    return _ASYNC_CKPTR


def load_checkpoint(path, network, trainer=None):
    """Restore into an already-constructed network (the structure carrier),
    mirroring the reference's build-empty-then-load flow.

    Restore strategy: first try a STRUCTURAL target (params/states from the
    network, optimiser cache materialised via init_cache when a trainer is
    given) so typed optimiser states — e.g. optax NamedTuples — come back as
    their real types. If the on-disk tree doesn't match (checkpoint saved
    with/without a cache), fall back to params+states only and skip the
    optimiser cache with a notice.
    NB: target-less placement is unsharded; re-apply mesh shardings afterwards
    via parallel.shard_network_params."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    base_target = {"params": network.gather_params(),
                   "states": network.gather_states()}
    restored = None
    if trainer is not None:
        wants_ema = (getattr(trainer, "_ema", None) is not None
                     or trainer.ema_decay is not None)
        # try the richest structural target first (opt cache + EMA shadow),
        # degrading gracefully for checkpoints saved without the EMA
        for with_ema in ((True, False) if wants_ema else (False,)):
            target = dict(base_target)
            target["opt_cache"] = (trainer._cache if trainer._cache is not None
                                   else trainer.optimiser.init_cache(
                                       network.gather_params()))
            if with_ema:
                target["ema"] = (trainer._ema if trainer._ema is not None
                                 else network.gather_params())
            try:
                restored = ckptr.restore(path, target)
            except Exception:
                restored = None
                continue
            trainer._cache = restored["opt_cache"]
            # mark the cache as belonging to THIS optimiser, or the first
            # step's _prepare would wipe the restored state back to zeros
            trainer._cache_owner = trainer.optimiser
            if with_ema:
                trainer._ema = restored["ema"]
            break
    if restored is None:
        try:
            restored = ckptr.restore(path, base_target)
        except Exception:
            # checkpoint carries extra keys (e.g. opt_cache) — raw restore,
            # apply params/states only
            raw = ckptr.restore(path)
            restored = {"params": raw["params"], "states": raw["states"]}
            if trainer is not None:
                print("orbax load: optimiser cache in checkpoint could not be "
                      "matched to this trainer — skipped (momentum restarts)")
    for l, p in zip(network.layers, restored["params"]):
        l.set_params(p)
    network.scatter_states(restored["states"])
    return network
