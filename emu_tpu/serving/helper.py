"""Replica pool for serving concurrency.

Behavioral model: `Helper` (ref Emu2/demo/backend/pytorch_model/backend.py:
55-93) — a fixed pool of pipeline replicas checked out under a semaphore.
On TPU a "replica" is a pipeline bound to a mesh slice rather than a GPU
group; a single-chip deployment simply pools one pipeline.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, List


class Helper:
    def __init__(self, build_fn: Callable[[int], object], concurrency: int):
        """build_fn(replica_index) → pipeline instance."""
        self._queue: "queue.Queue" = queue.Queue()
        self._sem = threading.BoundedSemaphore(concurrency)
        for i in range(concurrency):
            self._queue.put(build_fn(i))

    def get(self):
        self._sem.acquire()
        return self._queue.get()

    def put(self, pipeline):
        self._queue.put(pipeline)
        self._sem.release()
