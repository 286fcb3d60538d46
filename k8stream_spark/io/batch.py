"""W1/W2 — the count-or-time batch window (reference io/batch.go:15-37).

Semantics pinned by the reference's own test (io/batch_go:15-51, mirrored
in tests/test_batch.py): 14 events with batch_size=5, batch_interval=2 s
yield batches of {5, 5, 4}; after the input dries up, the next call
returns an empty batch once the interval elapses (the ingest loop skips
empty batches — reference flush.go:32-40).

Where this runs in the Spark engine: Structured Streaming's micro-batch
trigger covers the *time* half natively (``trigger(processingTime=...)``)
and source admission control covers the *count* half approximately
(``maxFilesPerTrigger``/``maxOffsetsPerTrigger``).  This class is the
exact N-or-T semantics for the driver-side ``foreachBatch`` path — it
re-chunks a micro-batch's rows into reference-sized flush units, and it
is the component the reference's batching test contract applies to.
"""

from __future__ import annotations

import queue
import time
from collections.abc import Iterable
from typing import Any


def batch_ident(clock_ns=time.time_ns) -> int:
    """W2 — batch identity: nanosecond wall clock (reference io/batch.go:8-10).
    Spark's ``foreachBatch`` batchId is stronger (stable across retries);
    this ident names the flush artifacts exactly like the reference."""
    return clock_ns()


class Batcher:
    """Drain a queue into count-or-time batches (reference io/batch.go:15-37).

    ``next_batch`` blocks until either ``batch_size`` items arrived or
    ``batch_interval`` seconds passed since the call started — whichever
    fires first — and returns (ident, items).  An empty list on timeout is
    the reference's empty-batch behavior; callers skip flushing those.
    """

    def __init__(
        self,
        batch_size: int,
        batch_interval: float,
        clock=time.monotonic,
        clock_ns=time.time_ns,
    ) -> None:
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if batch_interval <= 0:
            raise ValueError("batch_interval must be positive")
        self.batch_size = batch_size
        self.batch_interval = batch_interval
        self._clock = clock
        self._clock_ns = clock_ns
        # Bounded to batch_size — the reference's backpressure (W3): while
        # a batch flushes, producers block on the channel (flush.go:20).
        self.queue: queue.Queue[Any] = queue.Queue(maxsize=batch_size)

    def put(self, item: Any, timeout: float | None = None) -> None:
        self.queue.put(item, timeout=timeout)

    def next_batch(self) -> tuple[int, list[Any]]:
        deadline = self._clock() + self.batch_interval
        items: list[Any] = []
        while len(items) < self.batch_size:
            remaining = deadline - self._clock()
            if remaining <= 0:
                break
            try:
                items.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch_ident(self._clock_ns), items

    def drain_all(self, source: Iterable[Any]) -> list[tuple[int, list[Any]]]:
        """Batch a finite iterable (test/batch-mode helper): count splits
        apply, the time window trivially never fires mid-iterable."""
        out: list[tuple[int, list[Any]]] = []
        cur: list[Any] = []
        for item in source:
            cur.append(item)
            if len(cur) >= self.batch_size:
                out.append((batch_ident(self._clock_ns), cur))
                cur = []
        if cur:
            out.append((batch_ident(self._clock_ns), cur))
        return out
