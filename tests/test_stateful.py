"""D3 — processing-time TTL dedup cache (applyInPandasWithState).

Mirrors the reference's buntdb mark-with-expiry contract
(flush.go:57-62, handler.go:142-151): first occurrence emitted and
marked; re-occurrence within TTL dropped; re-occurrence after TTL
re-admitted.  Sequential runs share one checkpoint so state carries
across restarts exactly like the long-lived reference process.

Harness notes: ProcessingTimeTimeout keeps the engine scheduling
no-data micro-batches to service pending timers, so these runs disable
``noDataMicroBatches`` (the operator's data path checks deadlines
itself; timers are only state GC).  The sink is foreachBatch — the
memory sink cannot recover from a checkpoint.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import types as T

from k8stream_spark.streaming.stateful import dedup_ttl_stateful

SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType()),
        T.StructField("message", T.StringType()),
    ]
)


def _write(path: str, name: str, rows: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def no_data_batches_off(spark):
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    yield
    spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")


def _run_once(spark, src: str, ckpt: str, ttl: int) -> list[tuple[str, str]]:
    """One availableNow run over the shared checkpoint; returns the rows
    this run emitted."""
    stream = spark.readStream.schema(SCHEMA).json(src)
    deduped = dedup_ttl_stateful(stream, key="uid", ttl_seconds=ttl)
    emitted: list[tuple[str, str]] = []

    def collect(batch_df, _batch_id):
        emitted.extend((r.uid, r.message) for r in batch_df.collect())

    q = (
        deduped.writeStream.outputMode("update")
        .foreachBatch(collect)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "query did not terminate"
    return emitted


def test_ttl_dedup_drops_within_ttl(spark, tmp_path, no_data_batches_off):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ttl = 3600  # long TTL: run 2 is guaranteed inside it

    # Run 1: A twice + B once → A once (first row wins), B once.
    _write(src, "b1.json", [
        {"uid": "A", "message": "a1"},
        {"uid": "A", "message": "a2"},
        {"uid": "B", "message": "b1"},
    ])
    out1 = _run_once(spark, src, ckpt, ttl)
    assert sorted(out1) == [("A", "a1"), ("B", "b1")]

    # Run 2 (same checkpoint, within TTL): A again → dropped by the mark.
    _write(src, "b2.json", [{"uid": "A", "message": "a3"}])
    assert _run_once(spark, src, ckpt, ttl) == []


def test_ttl_dedup_readmits_after_expiry(spark, tmp_path, no_data_batches_off):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ttl = 1

    _write(src, "b1.json", [{"uid": "A", "message": "a1"}])
    assert _run_once(spark, src, ckpt, ttl) == [("A", "a1")]

    # Past the deadline: the mark is stale → A re-admitted
    # (reference semantics: cache GET after expiry misses).
    time.sleep(ttl + 1)
    _write(src, "b2.json", [{"uid": "A", "message": "a2"}])
    assert _run_once(spark, src, ckpt, ttl) == [("A", "a2")]
