"""Profiling & metrics utilities (SURVEY §5: the reference shipped only
vestigial line_profiler stubs — commented imports and no-op ``profile``
decorators, e.g. layers/convolution.py:6-10).

* ``StepTimer`` — throughput meter that understands async dispatch: marks are
  cheap; ``rate()`` forces a device sync via value fetch (block_until_ready is
  not reliable through the tunneled TPU platform) so reported images/sec are
  honest.
* ``trace`` — context manager around ``jax.profiler`` emitting a Perfetto-
  compatible trace directory (view at ui.perfetto.dev).
* ``RunningAverage`` — the EMA loss meter the reference example inlines
  (examples/imagenet_dogs_225_resnet_18_depsep.py:222-227).
"""

import contextlib
import time

import jax


class StepTimer:
    def __init__(self):
        self.reset()

    def reset(self):
        self._start = time.perf_counter()
        self._items = 0
        self._last_value = None

    def mark(self, num_items, sync_value=None):
        """Record a step of ``num_items`` images. Pass a device array (e.g. the
        step's loss) as sync_value so rate() can force completion."""
        self._items += num_items
        self._last_value = sync_value

    def rate(self):
        """Images/sec since reset, after forcing the dispatched chain to
        complete (fetches the last sync value)."""
        if self._last_value is not None:
            # the fetch IS the sync — a swallowed failure here would report a
            # dispatch rate, the exact dishonest number this class exists to
            # prevent (CLAUDE.md timing rule). Let fetch errors propagate.
            float(jax.numpy.ravel(self._last_value)[0])
        dt = time.perf_counter() - self._start
        return self._items / dt if dt > 0 else 0.0


@contextlib.contextmanager
def trace(log_dir="/tmp/dorknet_trace"):
    """Capture a device trace: ``with profiling.trace("/tmp/t"): step(...)``.
    Open the result with Perfetto / TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def summarize_device_trace(trace_dir, runs=1):
    """Aggregate a ``jax.profiler`` trace directory into per-op device-time
    totals — the per-fusion hotspot table that drives the PERF.md ledger
    (e.g. the BN custom-VJP rework: 59% of step → 14.5%).

    Returns ``(top_level_ms_per_run, rows)`` where rows are
    ``(op_name, ms_per_run, count_per_run, pct_of_top_level)`` sorted by
    total time. ``runs`` divides the totals so numbers read per dispatch.
    Device lanes are detected by process name (TPU/GPU/device); if none
    match (e.g. a CPU trace in tests), all lanes are aggregated."""
    import glob
    import gzip
    import json
    from collections import defaultdict

    ev = []
    for p in glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(p, "rt") as f:
            ev.extend(json.load(f).get("traceEvents", []))
    pidname = {e["pid"]: e["args"].get("name", "") for e in ev
               if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pidname.items()
                if "TPU" in n or "tpu" in n or "GPU" in n
                or "device" in n.lower()}
    if not dev_pids:
        dev_pids = set(pidname)

    tot = defaultdict(float)
    count = defaultdict(int)
    top_level = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):  # the enclosing program slice
            top_level += e.get("dur", 0)
            continue
        if name.isdigit():
            # per-run step-marker lanes (the profiler names them "0","1",...)
            # mirror the whole dispatch — counting them as ops would
            # double-book the entire step time
            continue
        tot[name] += e.get("dur", 0)
        count[name] += 1

    rows = [(name, us / runs / 1e3, max(1, round(count[name] / runs)),
             100.0 * us / top_level if top_level > 0 else 0.0)
            for name, us in sorted(tot.items(), key=lambda kv: -kv[1])]
    return top_level / runs / 1e3, rows


def print_trace_summary(top_level_ms, rows, title="program", top=30):
    """Render summarize_device_trace output as the standard hotspot table."""
    print(f"\n{title}: {top_level_ms:.2f} ms/dispatch device total")
    print(f"{'op':60s} {'ms/run':>9s} {'#':>5s} {'%':>6s}")
    for name, ms, n, pct in rows[:top]:
        print(f"{name[:60]:60s} {ms:9.3f} {n:5d} {pct:6.1f}")
    rest = sum(ms for _, ms, _, _ in rows[top:])
    print(f"{'(rest)':60s} {rest:9.3f}")


class RunningAverage:
    """EMA meter: first observation initialises, then v = m*v + (1-m)*x
    (the reference's running-loss bookkeeping)."""

    def __init__(self, momentum=0.9):
        self.momentum = momentum
        self.value = None

    def update(self, x):
        x = float(x)
        self.value = x if self.value is None else (
            self.momentum * self.value + (1 - self.momentum) * x)
        return self.value
