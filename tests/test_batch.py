"""W1/W2 batching semantics — mirrors reference io/batch_test.go:15-51:
14 events, batch_size=5, interval=2 s → batches {5,5,4}, then an empty
batch after the timeout."""

from __future__ import annotations

import threading
import time

import pytest

from k8stream_spark.io.batch import Batcher, batch_ident


def test_count_or_time_batching_5_5_4_then_empty():
    b = Batcher(batch_size=5, batch_interval=0.5)

    def feed():
        for i in range(14):
            b.put(i)
            time.sleep(0.01)

    t = threading.Thread(target=feed)
    t.start()
    sizes = [len(b.next_batch()[1]) for _ in range(3)]
    t.join()
    assert sizes == [5, 5, 4]  # io/batch_test.go:43
    ident, empty = b.next_batch()  # io/batch_test.go:45-48
    assert empty == []
    assert ident > 0


def test_time_window_fires_before_count():
    b = Batcher(batch_size=100, batch_interval=0.2)
    b.put("only")
    t0 = time.monotonic()
    _, items = b.next_batch()
    assert items == ["only"]
    assert time.monotonic() - t0 < 1.0


def test_backpressure_queue_bounded():
    # reference flush.go:20 — channel capacity == batch_size
    b = Batcher(batch_size=2, batch_interval=1)
    b.put(1)
    b.put(2)
    with pytest.raises(Exception):
        b.put(3, timeout=0.05)


def test_drain_all_count_splits():
    b = Batcher(batch_size=5, batch_interval=10)
    batches = b.drain_all(range(14))
    assert [len(items) for _, items in batches] == [5, 5, 4]
    idents = [ident for ident, _ in batches]
    assert idents == sorted(idents)


def test_invalid_config_rejected():
    with pytest.raises(ValueError):
        Batcher(batch_size=0, batch_interval=1)
    with pytest.raises(ValueError):
        Batcher(batch_size=1, batch_interval=0)


def test_batch_ident_is_nanos():
    assert batch_ident() > 1_000_000_000_000_000_000  # ns since epoch
