"""Batch-size autotuner: find a model's per-image-optimal training batch.

Why this exists (PERF.md round-3): XLA:TPU's per-image step cost is NOT
monotone in batch size — the flagship's cost cliffs ~2x right after b128
(layout/tiling choices flip once the batch passes a tile multiple), and the
same cliff shape shows on every model in the zoo (MobileNetV2's b192 is 3.3x
the per-image cost of its b128). Two practical consequences this module
automates:

1. the throughput-optimal per-device batch is found by sweeping, not by
   maximising memory use;
2. LARGER effective batches should be built from accumulated micro-batches
   at the sweet spot (``Trainer.accumulate_step``), not native big batches —
   measured +10.6% at effective-b256 and +24% at effective-b512 on the
   flagship.

The reference has no analogue (its batch size is a hand-picked constant,
/root/reference/examples/imagenet_dogs_225_resnet_18_depsep.py:25); this is
TPU-native production tooling.

Usage::

    from dorknet_tpu.utils.autotune import tune_train_batch
    result = tune_train_batch(lambda name: ResNet18(name, num_classes=120))
    result.best_batch          # e.g. 128
    result.plan(512)           # -> ("accumulate", 4, 128) micro-batch plan
    print(result.table())

Timing: device time from a ``jax.profiler`` trace when available (immune to
host-link noise — the only trustworthy number through the axon tunnel),
wall time with a hard value-fetch sync otherwise.
"""

import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp


def measure_device_ms(thunk, runs=3):
    """Total on-device ms per run of ``thunk`` (jax.profiler trace; the
    library form of what bench.py uses). Returns None when no device trace
    can be captured (e.g. CPU test platforms) — loudly, so a systematic
    trace/parse breakage cannot silently demote every measurement to
    link-noise wall time."""
    import shutil
    import sys
    import tempfile

    from dorknet_tpu.utils.profiling import summarize_device_trace

    d = tempfile.mkdtemp(prefix="dorknet_tune_")
    try:
        with jax.profiler.trace(d):
            for _ in range(runs):
                thunk()
        top_ms, _ = summarize_device_trace(d, runs=runs)
        return top_ms if top_ms > 0 else None
    except Exception as e:
        print(f"(device-time trace failed, falling back to wall: "
              f"{type(e).__name__}: {e})", file=sys.stderr, flush=True)
        return None
    finally:
        shutil.rmtree(d, ignore_errors=True)


@dataclass
class TuneResult:
    """Sweep outcome. ``rows`` are (batch, ms_per_step, img_per_sec, basis)
    where basis is "device" or "wall"."""

    rows: list = field(default_factory=list)

    def _comparable(self):
        """Rows safe to rank against each other. Device and wall ms are NOT
        commensurable (wall carries a 10-100x link-noise factor on tunneled
        hosts), so when one trace hiccup demotes a single candidate to wall
        basis, that row is excluded from decisions rather than letting its
        inflated ms lose (or its absence of device data win) unfairly."""
        dev = [r for r in self.rows if r[3] == "device"]
        return dev if dev else self.rows

    @property
    def best_batch(self):
        return max(self._comparable(), key=lambda r: r[2])[0]

    @property
    def best_ips(self):
        return max(self._comparable(), key=lambda r: r[2])[2]

    def plan(self, effective_batch):
        """Micro-batch plan for a target effective batch: accumulate k
        sweet-spot batches when that beats (or the sweep never measured) the
        native step. Returns ("native", 1, B) or ("accumulate", k, B).
        NOTE: when effective_batch is not a multiple of the sweet spot, the
        realized effective batch is k*B (the smallest multiple covering the
        target) — scale LR recipes by k*B, not the requested number. The
        native-vs-accumulate cost comparison is per-image for that reason."""
        rows = self._comparable()
        b = self.best_batch
        if effective_batch <= b:
            return ("native", 1, effective_batch)
        k = -(-effective_batch // b)  # ceil; realized effective = k*b
        best_ms = next(ms for B, ms, _, _ in rows if B == b)
        native = next((ms for B, ms, _, _ in rows
                       if B == effective_batch), None)
        if native is not None and \
                native / effective_batch < (k * best_ms) / (k * b):
            return ("native", 1, effective_batch)
        return ("accumulate", k, b)

    def table(self):
        lines = [f"{'batch':>6s} {'ms/step':>9s} {'img/s':>9s} basis"]
        for B, ms, ips, basis in self.rows:
            mark = "  <-- sweet spot" if B == self.best_batch else ""
            lines.append(f"{B:6d} {ms:9.2f} {ips:9.0f} {basis}{mark}")
        return "\n".join(lines)


def tune_serving_batch(network, batches=(64, 96, 112, 128, 144, 256),
                       image=225, fold_bn=True, steps=4, warmup=3,
                       prefer_device_time=True):
    """Sweep serving batch sizes for an ALREADY-TRAINED network (BN running
    stats initialised — the runner refuses placeholders) and return a
    TuneResult. The serving curve has the same post-sweet-spot cliff as
    training (round-3 sweep: b128 peaks at 64.9k bf16 img/s, b144 falls to
    31.7k); plan() composes multiple sweet-spot dispatches for larger
    request batches."""
    from dorknet_tpu.network.inference import InferenceRunner

    result = TuneResult()
    for B in batches:
        runner = InferenceRunner(network, batch_size=B, fold_bn=fold_bn)
        # device-resident timing via _run_fixed (same as bench.py /
        # bench_serving_sweep): predict_probs is the ragged HOST API — it
        # round-trips the whole batch through numpy each call, which on a
        # tunneled host measures link transfer, not the serving step
        X = jax.random.normal(jax.random.PRNGKey(B), (B, 3, image, image),
                              jnp.float32)
        for _ in range(max(1, warmup)):
            p = runner._run_fixed(X)
        np.asarray(p[0, 0])  # hard sync (one scalar)

        dms = (measure_device_ms(
                   lambda: np.asarray(runner._run_fixed(X)[0, 0]),
                   runs=steps)
               if prefer_device_time else None)
        if dms is not None:
            result.rows.append((B, dms, B / (dms / 1e3), "device"))
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(steps):
                p = runner._run_fixed(X)
            np.asarray(p[0, 0])
            best = min(best, (time.perf_counter() - t0) / steps)
        result.rows.append((B, best * 1e3, B / best, "wall"))
    return result


def tune_train_batch(build_net, batches=(64, 96, 128, 160, 192, 256),
                     image=225, classes=120, make_optimiser=None,
                     steps=4, warmup=3, prefer_device_time=True):
    """Sweep training batch sizes for a model and return a TuneResult.

    ``build_net(name) -> FeedForwardNetwork`` builds a FRESH network per
    candidate (each batch size is its own trace; sharing a net would chain
    optimiser state across candidates). ``make_optimiser(net, batch) ->
    Optimiser`` defaults to the flagship recipe's linearly-scaled
    SGDMomentum. Batches are created on device (a bulk device_put can stall
    a degraded link for minutes)."""
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import SGDMomentum

    if make_optimiser is None:
        def make_optimiser(net, batch):
            return SGDMomentum(net, 0.05 * (batch / 200.0), 0.9)

    result = TuneResult()
    for B in batches:
        np.random.seed(0)
        net = build_net(f"tune-b{B}")
        trainer = Trainer(net, make_optimiser(net, B))
        kx, ky = jax.random.split(jax.random.PRNGKey(B))
        X = jax.random.normal(kx, (B, 3, image, image), jnp.float32)
        y = jax.nn.one_hot(jax.random.randint(ky, (B,), 0, classes),
                           classes, dtype=jnp.float32)
        for _ in range(max(1, warmup)):  # >=1: the sync below needs a loss
            loss, _ = trainer.step(X, y)
        float(loss)  # hard sync (block_until_ready lies on the tunnel)

        dms = (measure_device_ms(lambda: float(trainer.step(X, y)[0]),
                                 runs=steps)
               if prefer_device_time else None)
        if dms is not None:
            result.rows.append((B, dms, B / (dms / 1e3), "device"))
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(steps):
                loss, _ = trainer.step(X, y)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / steps)
        result.rows.append((B, best * 1e3, B / best, "wall"))
    return result
