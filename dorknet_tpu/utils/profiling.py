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
