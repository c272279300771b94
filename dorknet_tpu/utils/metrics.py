"""Structured training metrics: one JSON object per line, appended atomically.

The reference logs free-text through ``logging`` (reference:
examples/imagenet_dogs_225_resnet_18_depsep.py:97-183 — running loss averages
and test accuracy as interpolated strings), which is human-readable but
unparseable after the fact. ``MetricsLogger`` keeps that console flow intact
and ADDS a machine-readable sidecar: each ``log()`` call appends one JSON
line (wall-clock timestamp + whatever scalars the caller passes), so loss
curves, learning-rate schedules and throughput are queryable after a run —
including across preemption/resume cycles, because append mode composes with
``utils.experiment.Experiment``'s restart flow.

Design notes (TPU-production):
- values are fetched with ``float()`` at log time — on the axon tunnel only a
  value fetch is a true device sync (CLAUDE.md), so logging a jax scalar here
  is also the step's synchronisation point; callers that log once per K-step
  ``multi_step`` window keep the one-fetch-per-window dispatch amortisation.
- lines are flushed per call: a preempted run's sidecar is valid JSONL up to
  the last completed ``log()``.
"""

import json
import os
import time

__all__ = ["MetricsLogger", "read_metrics"]


def _scalar(v):
    """Best-effort conversion to a JSON-serialisable scalar.

    jax/numpy 0-d arrays (and anything else exposing ``__float__``) become
    float — this is the value fetch that truly syncs the device. Bools, ints
    and strings pass through unchanged."""
    if isinstance(v, (bool, int, float, str)) or v is None:
        return v
    try:
        return float(v)
    except Exception:
        return repr(v)


class MetricsLogger:
    """Append-mode JSONL metrics writer.

        with MetricsLogger("run/metrics.jsonl") as m:
            for step in ...:
                loss = trainer.step(X, y)
                m.log(step=step, epoch=e, loss=loss,
                      lr=opt.learning_rate)

    Every record carries ``ts`` (unix seconds). Extra per-run constants can be
    bound once via ``bind`` (e.g. ``m.bind(model="resnet18", batch=128)``) and
    are merged into every subsequent record."""

    def __init__(self, path, resume=True):
        self.path = path
        d = os.path.dirname(os.path.abspath(path))
        os.makedirs(d, exist_ok=True)
        self._bound = {}
        self._f = open(path, "a" if resume else "w")
        if resume and self._f.tell() > 0:
            # a run killed mid-write leaves a truncated line with no trailing
            # newline; appending straight onto it would merge the first
            # resumed record into an unparseable line — terminate it first
            with open(path, "rb") as chk:
                chk.seek(-1, os.SEEK_END)
                if chk.read(1) != b"\n":
                    self._f.write("\n")
                    self._f.flush()

    def bind(self, **constants):
        self._bound.update({k: _scalar(v) for k, v in constants.items()})
        return self

    def log(self, **scalars):
        rec = {"ts": time.time()}
        rec.update(self._bound)
        rec.update({k: _scalar(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        return rec

    def close(self):
        if not self._f.closed:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def read_metrics(path):
    """Parse a metrics JSONL file back into a list of dicts. Unparseable
    lines (e.g. one truncated by a mid-write kill) are dropped individually,
    so records after them — a resumed run's — still load."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return out
