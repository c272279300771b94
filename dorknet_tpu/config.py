"""Global configuration for dorknet_tpu.

The reference framework is fp32 everywhere (NumPy/CuPy float32). We keep fp32 as
the default for numerics parity, but expose a compute-dtype policy so the MXU can
run matmuls/convs in bfloat16 with fp32 accumulation (params always stay fp32).
"""

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32
# Pallas fast paths default OFF: measured at parity with the XLA-native ops on
# v5e (step-level), and the XLA path doubles as the correctness oracle. Flip on
# per-run with set_use_pallas(True); bench.py reports both.
_USE_PALLAS = False
_MATMUL_PRECISION = None  # None = backend default (bf16 passes on TPU MXU)


def set_matmul_precision(precision):
    """Set lax precision for conv/dot ops: None (backend default — fastest on
    TPU, single bf16 MXU pass), "highest" (fp32-faithful, ~3-6 bf16 passes) or
    any ``lax.Precision``. Use "highest" for strict numerics parity with the
    fp32 reference on TPU; CPU is always true fp32."""
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = precision


def get_matmul_precision():
    return _MATMUL_PRECISION


def set_compute_dtype(dtype):
    """Set the dtype used for conv/matmul inputs inside the jitted step.

    Params and optimiser state remain float32; accumulation is always float32
    (``preferred_element_type``). Pass ``jnp.bfloat16`` for MXU-friendly compute.
    """
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def get_compute_dtype():
    return _COMPUTE_DTYPE


def set_use_pallas(flag: bool):
    """Enable/disable the Pallas fast-path COMPUTE kernels (depthwise,
    matmul, bn_stats; XLA-native ops are the fallback). The fused
    augmentation kernel has its own per-site gate — ``set_use_pallas_aug``
    below — and does NOT turn off with this flag (on TPU it defaults ON
    for standalone aug programs); use ``set_use_pallas_aug(False)`` to
    force the XLA planes path."""
    global _USE_PALLAS
    _USE_PALLAS = bool(flag)


def use_pallas() -> bool:
    return _USE_PALLAS


# The fused augmentation kernel gets its OWN tri-state gate because its
# measured adoption decision differs by call site (on-chip, wall-confirmed,
# PERF.md round-3 session-5): as the STANDALONE aug program it is a 2.2x
# device / 1.6x wall win over the XLA planes path (1.77 vs 3.90 ms per b128
# dispatch), but traced INSIDE the fused aug+train step it is a 3.0x device /
# 2.2x wall LOSS (48.4 vs 16.3 ms/step device) — the custom-call boundary splits the step
# program and defeats XLA's scheduling around the 128-step serial kernel
# grid. None = per-site default (ON for train_pipeline/augment programs on
# a TPU backend, OFF inside Trainer.step_augmented); True/False force it
# everywhere the structural gates (uint8, unsharded, VMEM bound) allow.
_USE_PALLAS_AUG = None


def set_use_pallas_aug(flag):
    """Force the fused Pallas augmentation kernel on (True), off (False), or
    restore the measured per-site defaults (None) — see the comment above."""
    global _USE_PALLAS_AUG
    _USE_PALLAS_AUG = None if flag is None else bool(flag)


def use_pallas_aug():
    """Tri-state: True/False = forced, None = per-site default."""
    return _USE_PALLAS_AUG


_SPMD_SAFE_GRADS = False


class spmd_safe_grads:
    """Context manager/flag: trace gradient rules that are safe under XLA SPMD
    partitioning. Currently switches the depthwise weight gradient from XLA's
    grouped-conv dgrad (fast, but mis-partitioned by a wrong mesh-axis factor
    under mixed batch/param shardings — jax 0.9.0, see ops/conv.py) to the
    explicit tap-reduction rule (always partitioned correctly, ~1.7x slower
    backward for the dw layers). The Trainer enables this automatically around
    tracing whenever a batch/param sharding is configured; single-device
    traces keep the fast rule. Part of trace_signature(), so flipping it
    retraces rather than silently reusing the other rule's program."""

    def __init__(self, flag=True):
        self.flag = bool(flag)

    def __enter__(self):
        global _SPMD_SAFE_GRADS
        self._prev = _SPMD_SAFE_GRADS
        _SPMD_SAFE_GRADS = self.flag
        return self

    def __exit__(self, *exc):
        global _SPMD_SAFE_GRADS
        _SPMD_SAFE_GRADS = self._prev
        return False


def use_spmd_safe_grads() -> bool:
    return _SPMD_SAFE_GRADS


_SPMD_DW_RULE = "conv"


def set_spmd_dw_rule(rule: str):
    """Select the SPMD-safe depthwise weight-gradient implementation used when
    ``spmd_safe_grads`` is active:

    - ``"conv"`` (default): a ``jax.experimental.custom_partitioning`` rule —
      per shard it runs exactly XLA's fast grouped filter-grad conv on the
      LOCAL data, then an explicit ``lax.psum`` over whatever mesh axes shard
      the batch. Correct by construction on any mesh (the buggy XLA SPMD
      grouped-dgrad partitioner is bypassed entirely) at single-device speed —
      it removes the +39% backward-dw cost of the tap rule (PERF.md round 3).
    - ``"taps"``: the explicit per-tap multiply-reduce formulation (the
      reference's fused ``depthwise_backward_direct_cy`` shape, reference:
      layers/im2col.pyx:143-178). Plain reductions partition correctly on any
      mesh without custom rules; kept as the fallback and cross-check oracle.
    """
    if rule not in ("conv", "taps"):
        raise ValueError(f"spmd_dw_rule must be 'conv' or 'taps', got {rule!r}")
    global _SPMD_DW_RULE
    _SPMD_DW_RULE = rule


def get_spmd_dw_rule() -> str:
    return _SPMD_DW_RULE


def enable_compilation_cache(cache_dir=None):
    """Enable JAX's persistent compilation cache for this process.

    First-time XLA compilation of the fused train step is the dominant cost of
    a process start on TPU (20-40 s per program through the tunnel); with the
    cache on, restarts — serving rollouts, preemption resume via
    ``utils.experiment.Experiment``, repeated bench runs — reload compiled
    programs from disk in milliseconds. Entries are keyed on platform, program
    and compile options, so a shared directory is safe across models.

    ``cache_dir`` defaults to ``~/.cache/dorknet_tpu/xla_cache_<platform>``
    (suffixed by ``$JAX_PLATFORMS`` so forced-CPU test runs stay out of the
    TPU cache directory). Returns the directory used. Thresholds are set to
    cache every program regardless of size or compile time — the framework's
    jitted steps are few and large, so there is no small-entry noise to
    filter.
    """
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "dorknet_tpu",
            "xla_cache_" + os.environ.get("JAX_PLATFORMS", "auto"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # jax binds its persistent-cache singleton to the directory at FIRST
    # use; without a reset, a second enable_compilation_cache (new dir)
    # silently keeps writing to the old one (entries landed in A after the
    # dir was switched to B — found by the suite-order flake in
    # test_enable_compilation_cache). reset_cache drops the singleton so
    # the next compile re-reads jax_compilation_cache_dir.
    try:
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()
    except Exception:
        pass  # older/newer jax without reset_cache: first-call dir sticks
    return cache_dir


def trace_signature():
    """Hashable tuple of every global policy read at TRACE time by the ops
    layer (compute dtype, pallas gate, matmul precision, SPMD-safe grad
    rules). Any jit cache keyed on network structure must ALSO key on this,
    or flipping a policy after a trace silently reuses the old numerics (the
    stale-trace class CLAUDE.md warns about — confirmed reproducible before
    this key existed)."""
    return (jnp.dtype(_COMPUTE_DTYPE).name, _USE_PALLAS, _MATMUL_PRECISION,
            _SPMD_SAFE_GRADS, _SPMD_DW_RULE)
