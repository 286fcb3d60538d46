"""End-to-end streaming throughput: run the full W4 pipeline
(eligibility → dedup → enrichment joins → L9 projection → distributed
JSON sink) over the sf-dir events rendered as the k8s-event JSON shape,
and report events/s.

The reference's only published throughput anchor is its channel/batch
sizing (~333 events/s design point, BASELINE.md); this measures the
same single-node contract on BOTH source bindings — the built-in file
stream source and the custom ``k8s_informer`` DataSourceStreamReader
(LIST/WATCH offsets, sources/informer.py) — one JSON line each.

Also measures the continuous-ingestion DOCUMENT gate (r8): a streamed
new-document batch runs the stream-static exact incremental dedup
(``incremental_exact_filter`` anti-join against the reference corpus)
plus the watermarked within-stream content dedup (``dedup_streaming``
on the md5 hash — RocksDB state store, the session default from
SCALE.md), reporting docs/s.  One more JSON line.

Usage: python scripts/stream_bench.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from k8stream_spark.session import get_spark  # noqa: E402
from k8stream_spark.streaming.pipeline import (  # noqa: E402
    distributed_json_sink,
    run_pipeline,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="sb-")
    spark = get_spark("stream-bench")

    # Render the k8s-shaped event stream to NDJSON spool files (source
    # prep — not timed; the reference equivalently receives its events
    # from the API server).
    events = entrymod._k8s_events(spark, sf_dir)
    n = events.count()
    src = f"{work}/src"
    events.write.mode("overwrite").json(src)

    objects = entrymod._objects(spark, sf_dir)
    nodes = entrymod._nodes(spark, sf_dir)

    for source_format in ("files", "informer"):
        t0 = time.time()
        q = run_pipeline(
            spark,
            src,
            objects,
            nodes,
            sink_fn=distributed_json_sink(
                f"{work}/out-{source_format}", compress_gzip=True
            ),
            checkpoint_dir=f"{work}/ckpt-{source_format}",
            available_now=True,
            namespaces=(),
            reasons=(),
            source_format=source_format,
        )
        finished = q.awaitTermination(600)
        elapsed = time.time() - t0
        if not finished:
            q.stop()
            raise RuntimeError(
                "pipeline did not finish within 600s - refusing to report "
                "a throughput number for an incomplete run"
            )

        print(
            json.dumps(
                {
                    "metric": "stream_pipeline_throughput",
                    "source": source_format,
                    "events_in": n,
                    "seconds": round(elapsed, 2),
                    "events_per_sec": round(n / elapsed, 1),
                    "sf_dir": sf_dir,
                }
            )
        )
    # --- continuous-ingestion document gate (stream-static incremental
    # dedup + watermarked within-stream dedup, RocksDB-backed state) ---
    from pyspark.sql import functions as F

    from k8stream_spark.analytics.dedup import incremental_exact_filter
    from k8stream_spark.ops.dedup import dedup_streaming
    from k8stream_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    # Even doc_ids play the (static, periodically refreshed) reference
    # corpus, odd ones the streamed new batch — the
    # docs_dedup_incremental oracle's split.
    ref = docs.where((F.col("doc_id") % 2) == 0)
    new = docs.where((F.col("doc_id") % 2) == 1).withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("doc_id") % 3600
        ),
    )
    n_docs = new.count()
    doc_src = f"{work}/docsrc"
    new.write.mode("overwrite").json(doc_src)
    stream = spark.readStream.schema(new.schema).json(doc_src)
    t0 = time.time()
    gated = dedup_streaming(
        incremental_exact_filter(stream, ref).withColumn(
            "__h", F.md5(F.col("text"))
        ),
        key="__h",
        ts_col="ts",
    )
    q = (
        gated.writeStream.format("noop")
        .option("checkpointLocation", f"{work}/ckpt-docgate")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(600)
    elapsed = time.time() - t0
    if not finished:
        q.stop()
        raise RuntimeError(
            "doc-gate stream did not finish within 600s - refusing to "
            "report a throughput number for an incomplete run"
        )
    print(
        json.dumps(
            {
                "metric": "stream_doc_gate_throughput",
                "docs_in": n_docs,
                "seconds": round(elapsed, 2),
                "docs_per_sec": round(n_docs / elapsed, 1),
                "sf_dir": sf_dir,
            }
        )
    )
    # --- continuous-ingestion NEAR-dup gate (r9): per micro-batch,
    # the new docs audit against the reference corpus through the
    # banded LSH join (pipeline.near_dup_gate_sink).  The reference
    # artifacts (signature frame + md5 set) are a once-per-corpus-
    # version cost, reported separately from the per-doc rate. ---
    from k8stream_spark.streaming.pipeline import near_dup_gate_sink

    t0 = time.time()
    gate_fn = near_dup_gate_sink(
        ref, lambda df, _b: df.write.format("noop").mode("overwrite").save()
    )
    prep_s = time.time() - t0
    stream2 = spark.readStream.schema(new.schema).json(doc_src)
    t0 = time.time()
    q = (
        stream2.writeStream.outputMode("append")
        .foreachBatch(gate_fn)
        .option("checkpointLocation", f"{work}/ckpt-neardup")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(600)
    elapsed = time.time() - t0
    if not finished:
        q.stop()
        raise RuntimeError(
            "near-dup gate stream did not finish within 600s - refusing "
            "to report a throughput number for an incomplete run"
        )
    print(
        json.dumps(
            {
                "metric": "stream_near_dup_gate_throughput",
                "docs_in": n_docs,
                "seconds": round(elapsed, 2),
                "docs_per_sec": round(n_docs / elapsed, 1),
                "ref_artifact_prep_sec": round(prep_s, 2),
                "sf_dir": sf_dir,
            }
        )
    )
    # --- keyed-state analytics twins (r8): per-group moment state for
    # z-score anomaly scoring and the equi-width histogram-bin state,
    # both applyInPandasWithState on the RocksDB provider — measured
    # over the sf events table streamed as JSON.  One line each. ---
    from k8stream_spark.streaming.stateful import (
        anomaly_stats_stateful,
        histogram_bins_stateful,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    n_ev = ev.count()
    ev_src = f"{work}/evsrc"
    ev.write.mode("overwrite").json(ev_src)
    for name, op in (
        ("anomaly_stats_stateful", anomaly_stats_stateful),
        ("histogram_bins_stateful", histogram_bins_stateful),
    ):
        stream = spark.readStream.schema(ev.schema).json(ev_src)
        t0 = time.time()
        q = (
            op(stream)
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt-{name}")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(600)
        elapsed = time.time() - t0
        if not finished:
            q.stop()
            raise RuntimeError(
                f"{name} stream did not finish within 600s - refusing to "
                "report a throughput number for an incomplete run"
            )
        print(
            json.dumps(
                {
                    "metric": "stream_stateful_throughput",
                    "operator": name,
                    "events_in": n_ev,
                    "seconds": round(elapsed, 2),
                    "events_per_sec": round(n_ev / elapsed, 1),
                    "sf_dir": sf_dir,
                }
            )
        )
    spark.stop()
    if len(sys.argv) <= 2:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
