"""SparkSession factory with the engine's standard configuration.

Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same builder options apply unchanged (the master is injected by spark-submit).
Every knob here is chosen for the 100 TB posture:

  * AQE on — runtime coalescing, skew-join splitting, dynamic join-strategy
    demotion are essential once partition statistics are only known at run
    time on big inputs.
  * ``spark.sql.shuffle.partitions`` defaults to the constant 32 (matching
    the local[32] test harness); at cluster scale AQE's coalescing makes the
    initial number a ceiling rather than a tuning knob.
  * Arrow enabled — every pandas_udf / mapInPandas boundary is Arrow-batched.
  * Session timezone pinned UTC so event-time semantics are stable and the
    DuckDB oracle (UTC-naive timestamps) compares cleanly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "k8stream_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master=None`` → ``local[$SPARK_GRAFT_CPUS]`` for local runs; pass an
    explicit master (or let spark-submit inject one) on a cluster.
    """
    n = cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{n}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The driver fixtures are TIMESTAMP(NANOS) parquet; read nanos as
        # long and let the loader convert (sources/fixtures.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # In local mode the driver JVM hosts every executor thread;
        # Spark's 1g default starves 32 of them (observed: GC-locker
        # death on map-heavy aggregates at sf0.1).  Size the single heap
        # for the thread count; harmless when spark-submit overrides.
        # 16g (was 8g): the 41-query bench session showed late-session
        # GC tails at 8g that the 24-query session never hit.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # A 41-query × 3-rep session compiles ~120+ whole-stage-codegen
        # classes; the JVM's default 240m code cache fills mid-session,
        # JIT compilation stops, and every later query runs partially
        # interpreted (the flat ~1.5× late-session inflation seen in the
        # r5 bench tail).  512m keeps codegen compiled end-to-end.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=512m",
            ),
        )
        # ContextCleaner only releases shuffle files, broadcast blocks and
        # localCheckpoint RDDs after a DRIVER GC collects their references
        # — and the default periodic-GC interval is 30min.  A large heap
        # means organic GCs are rare, so a many-query session accumulates
        # dead executor-side state for minutes and later queries inherit
        # the litter (observed: docs_dedup_clusters 6s isolated vs 12-50s
        # late in the 41-query bench).  1min bounds the litter window.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "1min"),
        )
        .config("spark.ui.enabled", "false")
        # The console progress bar writes \r-terminated lines that glue
        # onto diagnostic output (check_oracle / plan_audit line parsing).
        .config("spark.ui.showConsoleProgress", "false")
        # Streaming state at scale: RocksDB keeps dedup state off-heap and
        # incrementally checkpointed (reference's buntdb cache analog,
        # reference cache.go:19-140 — but durable and partitioned).
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
