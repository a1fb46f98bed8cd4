"""Dynamic request batching for chat serving.

Beyond the reference (whose Helper pool runs one request per replica at a
time): concurrent requests with identical generation kwargs are coalesced
into one padded batch and run as a single TPU program — the way to feed a
chip whose decode step costs the same for batch 1 and batch 8.

Mechanics: requests enqueue with a per-request future; a dispatcher thread
drains the queue, groups by kwargs signature, waits up to `max_wait_ms`
for the batch to fill (bounded by `max_batch`), runs
`pipeline.generate_batch`, and resolves the futures in order.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import List, Tuple


def _signature(kwargs: dict) -> Tuple:
    return tuple(sorted(kwargs.items()))


class BatchingChatHelper:
    """Drop-in for serving.Helper on the chat route: `get()` returns a
    proxy whose __call__ blocks until its batched result is ready."""

    def __init__(self, pipeline, max_batch: int = 8, max_wait_ms: int = 30):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.requests: "queue.Queue" = queue.Queue()
        self.batch_sizes: List[int] = []          # dispatch telemetry
        self._stop = False
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._thread.start()

    # Helper-compatible interface ------------------------------------------

    def get(self):
        return _Proxy(self)

    def put(self, proxy):
        pass

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=5)

    # dispatcher -------------------------------------------------------------

    def _submit(self, inputs, kwargs) -> Future:
        fut: Future = Future()
        self.requests.put((inputs, _signature(kwargs), kwargs, fut))
        return fut

    def _dispatch(self):
        import time
        while not self._stop:
            try:
                first = self.requests.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            sig = first[1]
            deadline = time.monotonic() + self.max_wait
            spill = []
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    req = self.requests.get(timeout=remaining)
                except queue.Empty:
                    break
                if req[1] == sig:
                    batch.append(req)
                else:
                    spill.append(req)        # different kwargs: next round
            for req in spill:
                self.requests.put(req)

            inputs = [r[0] for r in batch]
            kwargs = batch[0][2]
            self.batch_sizes.append(len(batch))
            try:
                outs = self.pipeline.generate_batch(inputs, **kwargs)
                for (_, _, _, fut), out in zip(batch, outs):
                    fut.set_result(out)
            except Exception as ex:  # noqa: BLE001
                for _, _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(ex)


class _Proxy:
    """Pipeline-shaped handle that routes through the batcher."""

    def __init__(self, helper: BatchingChatHelper):
        self._helper = helper

    def __call__(self, inputs, **kwargs):
        return self._helper._submit(inputs, kwargs).result(timeout=600)
