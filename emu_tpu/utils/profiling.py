"""Tracing / profiling utilities (survey §5: the reference has none in
model code; this is the TPU-native observability layer).

- `trace(dir)` context: jax.profiler trace for TensorBoard/Perfetto;
- `annotate(name)`: named region visible in traces (TraceAnnotation);
- `StepTimer`: lightweight wall-clock + tokens/sec accounting for serving
  (per-request ms logging like the reference demo backend) and eval loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard or Perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: `with annotate("prefill"): ...`."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulating phase timer with throughput accounting."""

    def __init__(self):
        self.totals = {}
        self.counts = {}
        self.items = {}

    @contextlib.contextmanager
    def phase(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            self.items[name] = self.items.get(name, 0) + items

    def report(self) -> dict:
        out = {}
        for name, total in self.totals.items():
            entry = {"total_s": round(total, 4),
                     "calls": self.counts[name],
                     "mean_ms": round(1e3 * total / self.counts[name], 3)}
            if self.items.get(name):
                entry["items_per_s"] = round(self.items[name] / total, 2)
            out[name] = entry
        return out


def device_memory_stats() -> Optional[dict]:
    """Per-device memory usage when the backend exposes it."""
    import jax
    try:
        stats = jax.devices()[0].memory_stats()
        return {k: stats[k] for k in
                ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                if k in stats}
    except Exception:  # noqa: BLE001
        return None
