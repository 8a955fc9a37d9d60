"""Profiling utilities.

The reference streams per-layer Event timers to its dashboard
(progress_tracker.py, SURVEY §5.1); the TPU equivalents here are:

  * `device_trace(dir)` — context manager around `jax.profiler.trace`,
    producing an xprof/TensorBoard-loadable trace of XLA execution;
  * `StageTimers` — named cumulative wall-clock timers for host pipeline
    stages (the interpreter components keep per-stage timers the same
    way, interpreter.py timers dicts).
"""

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def device_trace(log_dir='generated_files/xprof'):
    """Capture an XLA device trace viewable in xprof/TensorBoard."""
    with jax.profiler.trace(str(log_dir)):
        yield


class StageTimers:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def track(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self):
        return {
            name: {'total_s': round(self.totals[name], 4),
                   'count': self.counts[name],
                   'mean_ms': round(1e3 * self.totals[name]
                                    / max(1, self.counts[name]), 3)}
            for name in self.totals
        }

    def print(self, prefix=''):
        for name, stats in sorted(self.summary().items()):
            print(f'{prefix}{name}: {stats["total_s"]}s '
                  f'x{stats["count"]} ({stats["mean_ms"]}ms avg)')
