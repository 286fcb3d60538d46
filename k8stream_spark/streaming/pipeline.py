"""W4 — the streaming binding: the reference's ingest loop
(reference flush.go:19-30, main.go:73-94) as one Structured Streaming
query.

    readStream(k8s-event JSON) → eligibility filter (P1-P5)
      → watermarked dedup (D1) → stream-static broadcast joins (J1-J3)
      → L9Event projection (P6) → foreachBatch → N-or-T rechunk → sink

Batch/stream symmetry (SURVEY.md §7.1): the transformation functions are
the exact same ``ops.*`` functions the batch oracle checks — this module
only binds them to ``readStream`` and a sink.

Scale posture: the static dims are re-read every micro-batch (the
reference's 3600 s cache TTL analog); dedup state lives in the RocksDB
state store (session.py); sink writes go through the vectorized JSON
writer.  The exact count-or-time flush (W1) runs inside foreachBatch via
``Batcher`` semantics — Spark's trigger covers the time half natively.
"""

from __future__ import annotations

import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from k8stream_spark.io.ndjson import ndjson_bytes
from k8stream_spark.io.sinks import Flusher
from k8stream_spark.ops import dedup, filters, joins
from k8stream_spark.schemas import K8S_EVENT_SCHEMA


def build_event_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
    source_format: str = "files",
    resync_interval: int = 0,
) -> DataFrame:
    """S1 — k8s-event stream.  ``source_format="files"`` reads the
    JSON-lines directory through Spark's file source (the test/bench
    shape); ``"informer"`` reads the same directory through the custom
    ``k8s_informer`` DataSourceStreamReader (sources/informer.py), which
    models the reference's LIST→WATCH→RESYNC contract (main.go:77-94,
    resync config.go:19-23) — identical schema and downstream plan.
    ``maxFilesPerTrigger`` is the count half of the reference's
    count-or-time batching at the source admission level."""
    if source_format == "informer":
        from k8stream_spark.sources.informer import informer_stream

        return informer_stream(
            spark, source_dir, kind="event", resync_interval=resync_interval
        )
    reader = spark.readStream.schema(K8S_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(source_dir)


def build_service_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
    source_format: str = "files",
    resync_interval: int = 0,
) -> DataFrame:
    """S2 — k8s-service stream (reference main.go:82-86: services get their
    own informer because changes don't surface on the events interface).
    Same source_format choice as ``build_event_stream``."""
    from k8stream_spark.schemas import K8S_SERVICE_SCHEMA

    if source_format == "informer":
        from k8stream_spark.sources.informer import informer_stream

        return informer_stream(
            spark, source_dir, kind="service", resync_interval=resync_interval
        )
    reader = spark.readStream.schema(K8S_SERVICE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(source_dir)


def transform_services(
    services: DataFrame,
    namespaces: Sequence[str] = (),
    streaming_dedup: bool = True,
    dedup_mode: str = "exact_watermark",
) -> DataFrame:
    """The service-side hot path (reference handler.go:82-120): eligibility
    (P1/P2/P4) → version dedup (D2) → L9Event synthesis (P10).

    Streaming dedup modes (``streaming_dedup=True``):

    * ``"exact_watermark"`` — dropDuplicatesWithinWatermark on
      (uid, resource_version): the reference's RUNTIME behavior (its cache
      key is ``{uid}-{rv}``, handler.go:96-97, so only exact repeats ever
      hit the ``>=`` branch).  Works under append output mode.
    * ``"keep_latest"`` — ``stateful.keep_latest_stateful``: the ``>=``
      comparison AS WRITTEN (handler.go:111) — also drops an out-of-order
      OLDER version arriving after a newer one, matching the batch D2
      oracle.  Requires update output mode (applyInPandasWithState).
    """
    from pyspark.sql import functions as F

    from k8stream_spark.ops import project as opsproject

    eligible = filters.eligible_services(services, namespaces=namespaces)
    if streaming_dedup:
        if dedup_mode == "keep_latest":
            from k8stream_spark.streaming.stateful import keep_latest_stateful

            deduped = keep_latest_stateful(
                eligible, key="uid", version_col="resource_version"
            )
        else:
            # the synthetic wall-clock arrival time bounds the dedup state
            deduped = (
                eligible.withColumn("__arrival", F.current_timestamp())
                .withWatermark("__arrival", "1 hour")
                .dropDuplicatesWithinWatermark(["uid", "resource_version"])
                .drop("__arrival")
            )
    else:
        deduped = dedup.keep_latest_version(
            eligible, key="uid", version_col="resource_version"
        )
    # Keep labels/annotations: the reference stamps service L9 events with
    # them (event_service.go:72-112) and the event side of union_streams
    # carries the same map<string,string> columns, so they align by name.
    return opsproject.service_event_synthesis(deduped)


def run_unified_pipeline(
    spark: SparkSession,
    event_source_dir: str,
    service_source_dir: str,
    objects: DataFrame,
    nodes: DataFrame,
    sink_fn,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    available_now: bool = False,
    namespaces: Sequence[str] = (),
    reasons: Sequence[str] = (),
    source_format: str = "files",
    resync_interval: int = 0,
):
    """U1 in streaming form — the reference's two informer streams feed one
    channel (main.go:84-90); here both streaming frames union into ONE
    streaming query with one sink and one checkpoint."""
    events = build_event_stream(
        spark,
        event_source_dir,
        source_format=source_format,
        resync_interval=resync_interval,
    )
    ev_l9 = transform_events(
        events, objects, nodes, namespaces=namespaces, reasons=reasons
    )
    services = build_service_stream(
        spark,
        service_source_dir,
        source_format=source_format,
        resync_interval=resync_interval,
    )
    svc_l9 = transform_services(services, namespaces=namespaces)
    unified = joins.union_streams(ev_l9, svc_l9)

    writer = (
        unified.writeStream.outputMode("append")
        .foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def transform_events(
    events: DataFrame,
    objects: DataFrame,
    nodes: DataFrame,
    namespaces: Sequence[str] = (),
    reasons: Sequence[str] = (),
    streaming_dedup: bool = True,
) -> DataFrame:
    """The reference hot path (SURVEY.md §3.1) as one declarative plan.
    Works identically on a batch frame (streaming_dedup=False → window
    dedup) and a streaming frame."""
    eligible = filters.eligible_events(
        events, namespaces=namespaces, reasons=reasons
    )
    if streaming_dedup:
        deduped = dedup.dedup_streaming(eligible, key="uid", ts_col="creation_ts")
    else:
        # message (not ref_uid, which is constant within a uid partition)
        # breaks same-timestamp ties deterministically.
        deduped = dedup.dedup_first_seen(
            eligible, keys=["uid"], order_by=["creation_ts", "message"]
        )
    enriched = joins.enrich_involved_object(deduped, objects)
    enriched = joins.node_addresses(enriched, nodes)
    enriched = joins.conditional_pod_enrich(enriched)
    return project_enriched_l9(enriched)


def project_enriched_l9(enriched: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    from k8stream_spark import L9_VERSION

    return enriched.select(
        F.col("uid").alias("id"),
        # NTZ-safe epoch seconds: NTZ → TIMESTAMP under the pinned-UTC
        # session, then truncate to long (event.go:52 semantics).
        F.col("creation_ts").cast("timestamp").cast("long").alias("timestamp"),
        F.col("source_component").alias("component"),
        F.col("source_host").alias("host"),
        F.col("message"),
        F.col("namespace"),
        F.col("reason"),
        F.col("ref_uid").alias("reference_uid"),
        F.col("ref_namespace").alias("reference_namespace"),
        F.col("ref_name").alias("reference_name"),
        F.col("ref_kind").alias("reference_kind"),
        F.col("ref_api_version").alias("reference_version"),
        F.col("obj_uid").alias("object_uid"),
        F.col("obj_labels").alias("labels"),
        F.col("obj_annotations").alias("annotations"),
        F.col("address"),
        F.col("pod_uid"),
        F.col("pod_name"),
        F.col("pod_namespace"),
        F.col("pod_ip"),
        F.col("pod_host_ip"),
        F.col("pod_start_time"),
        F.lit(L9_VERSION).alias("version"),
    )


def sink_foreach_batch(
    flusher: Flusher, uid: str, batch_size: int = 10000
):
    """foreachBatch function: rechunk the micro-batch into reference-sized
    flush units (the count half of W1) and hand each to the Flusher as
    NDJSON — one artifact per chunk, named by a nanosecond ident (W2).

    NOTE on scale: this driver-side path exists for reference-parity
    sinks (one named object per batch).  The throughput path at 100 TB is
    ``batch_df.write.json(path)`` — fully distributed — which callers get
    by passing ``distributed_json_sink`` instead.
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        rows = (r.asDict(recursive=True) for r in batch_df.toLocalIterator())
        chunk: list[dict] = []
        for row in rows:
            chunk.append(row)
            if len(chunk) >= batch_size:
                flusher.flush(uid, time.time_ns(), ndjson_bytes(chunk))
                chunk = []
        if chunk:
            flusher.flush(uid, time.time_ns(), ndjson_bytes(chunk))

    return fn


def near_dup_gate_sink(
    ref_docs: DataFrame,
    sink_fn,
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
):
    """Continuous-ingestion NEAR-dup gate — the foreachBatch binding the
    ``incremental_exact_filter`` docstring defers to: each micro-batch
    is one crawl round audited by the batch operator
    ``analytics.dedup.incremental_dedup`` (new-batch × reference-corpus
    banded LSH join; within-stream dedup remains the separate
    ``dedup_streaming`` stage, as in the exact document gate).

    The reference corpus artifacts — the minhash signature frame and
    the md5 set — are computed ONCE here and reused by every trigger
    (the persist-once-per-corpus-version contract from the
    ``incremental_dedup`` docstring): at 100 TB re-shingling the corpus
    per micro-batch would dwarf the batch itself.  Per-doc audit rows
    are independent across new docs (each is judged against the
    reference only), so the union of per-trigger audits equals the
    one-shot batch audit regardless of how the stream is micro-batched
    — the batch/stream symmetry contract, pinned by pytest.

    ``sink_fn(audit_df, batch_id)`` receives the full audit frame
    (doc_id, is_exact_dup, near_dup_of, max_jaccard, kept); filter on
    ``kept`` for the survivor stream.  Returns the foreachBatch fn.
    """
    from k8stream_spark.analytics.dedup import (
        incremental_dedup,
        minhash_band_table,
        minhash_signature,
    )
    from pyspark.sql import functions as F

    # Prune the shingle strings before persisting — the gate only reads
    # (doc_id, __sh64, sig); see the matching prune in incremental_dedup.
    # _spread: a single-file local reference would otherwise compute
    # every signature on one core (conditional — no exchange when the
    # corpus already arrives partitioned).
    from k8stream_spark.analytics.similarity import _spread

    ref_sigs = minhash_signature(
        _spread(ref_docs, "doc_id"), text_col, num_hashes, shingle_n
    ).select("doc_id", "__sh64", "sig").persist()
    ref_sigs.count()
    ref_hashes = (
        ref_docs.select(F.md5(F.col(text_col)).alias("__h"))
        .distinct()
        .persist()
    )
    ref_hashes.count()
    # Banding is per-corpus-version too (r12): recomputing the 32-band
    # explode + xxhash over the whole reference every micro-batch made
    # the banding, not the batch, the per-trigger cost.
    ref_bands = minhash_band_table(
        ref_sigs, "ref_id", num_hashes, bands
    ).persist()
    ref_bands.count()

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        audited = incremental_dedup(
            batch_df,
            ref_docs,
            text_col=text_col,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            ref_sigs=ref_sigs,
            ref_hashes=ref_hashes,
            ref_bands=ref_bands,
            # A micro-batch is tiny next to the corpus: broadcast the
            # new side so the reference never shuffles per trigger.
            broadcast_new=True,
        )
        sink_fn(audited, batch_id)

    return fn


def distributed_json_sink(base_path: str, compress_gzip: bool = True):
    """The scale sink: every partition writes in parallel through the JVM
    JSON writer; one directory per micro-batch."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.mode("overwrite")
        if compress_gzip:
            writer = writer.option("compression", "gzip")
        writer.json(f"{base_path}/batch={batch_id}")

    return fn


def run_pipeline(
    spark: SparkSession,
    source_dir: str,
    objects: DataFrame,
    nodes: DataFrame,
    sink_fn,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    available_now: bool = False,
    namespaces: Sequence[str] = (),
    reasons: Sequence[str] = (),
    source_format: str = "files",
    resync_interval: int = 0,
):
    """Assemble and start the full streaming query (reference main.go:73-94).
    Returns the StreamingQuery; callers own ``awaitTermination``/``stop``
    (the reference's trapSignal, main.go:96-112).  ``resync_interval``
    (informer source only) enables the periodic re-list, reference
    default 120 s (config.go:8)."""
    events = build_event_stream(
        spark,
        source_dir,
        source_format=source_format,
        resync_interval=resync_interval,
    )
    l9 = transform_events(
        events, objects, nodes, namespaces=namespaces, reasons=reasons
    )

    writer = (
        l9.writeStream.outputMode("append")
        .foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
