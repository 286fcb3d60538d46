"""D3 — the reference's TTL KV dedup cache as a custom stateful operator.

The reference marks each flushed event UID in a buntdb table with a
3600 s expiry (flush.go:57-62, cache.go) and drops any incoming event
whose UID is still marked (handler.go:142-151).  That is a
*processing-time* TTL: the mark expires one hour after it was written,
regardless of event timestamps.

``dedup_streaming`` (ops/dedup.py) models this with an event-time
watermark — the right default on Spark because it is deterministic on
replay.  This module adds the exact processing-time semantics as a
custom stateful operator via ``applyInPandasWithState``: per-key state
("seen") with a real ProcessingTimeTimeout that evicts the mark after
``ttl_seconds``, after which the key may be emitted again — byte-for-byte
the reference's cache contract, including re-emission after expiry,
which the watermark form cannot express.

Scale posture: state is one boolean per live key, partitioned by the
grouping key across executors and persisted in the RocksDB state store
(session.py); timeouts make state size O(keys seen in the last TTL), not
O(all keys ever).  The Pandas UDF touches only the first row per key per
micro-batch — the grouping shuffle is the same one any keyed dedup pays.
"""

from __future__ import annotations

import time
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_TTL_SECONDS = 3600  # reference k8sclient.go:19-21 objectCacheExpiry


def dedup_ttl_stateful(
    df: DataFrame,
    key: str = "uid",
    ttl_seconds: int = DEDUP_TTL_SECONDS,
) -> DataFrame:
    """Keep the first row per ``key`` seen within a processing-time TTL
    window; the mark self-evicts ``ttl_seconds`` after it was set and the
    key becomes eligible again (reference flush.go:57-62 semantics).

    Works on a *streaming* grouped frame; output mode must be "update".
    Column order is preserved from ``df``.

    Deployment note: with ProcessingTimeTimeout the engine schedules
    no-data micro-batches to service pending timers, so a
    ``trigger(availableNow=True)`` run never self-terminates.  Batch-style
    harnesses should set ``spark.sql.streaming.noDataMicroBatches.enabled
    = false`` (safe here: the data path re-checks deadlines itself, the
    timer path is only state GC) or drain-and-stop; a continuous
    deployment is unaffected.
    """
    out_schema = df.schema
    cols = [f.name for f in out_schema.fields]
    ttl_ms = ttl_seconds * 1000

    def fn(
        _key: Any,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL elapsed with no traffic for this key: drop the mark so
            # the state store stays O(keys seen within the last TTL).
            state.remove()
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]][cols]
        if first is None:
            return
        now_ms = int(time.time() * 1000)
        if state.exists:
            # Spark only raises hasTimedOut for keys with NO data in the
            # batch, so an expired mark that receives traffic must be
            # detected here: past its deadline → re-admit (the reference's
            # cache GET after expiry misses, handler.go:142-151).
            (deadline_ms,) = state.get
            if now_ms < deadline_ms:
                # Marked and still live → duplicate → drop.  No refresh:
                # the reference's mark expires from WRITE time, not
                # last-seen (flush.go:57-62 sets expiry once, at mark).
                return
        state.update((now_ms + ttl_ms,))
        state.setTimeoutDuration(ttl_ms)
        yield first

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="deadline_ms long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
