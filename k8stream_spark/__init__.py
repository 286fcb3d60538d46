"""k8stream_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of last9/k8stream, rebuilt Spark-first.

The reference (``/root/reference``, Go) is a streaming ETL pipeline for
Kubernetes events: watch → filter → dedup → enrich (lookup joins) → batch →
NDJSON/gzip → sink.  This package re-expresses every operator in that
pipeline as declarative DataFrame transformations (see SURVEY.md §2 for the
operator inventory and file:line citations), then extends the engine with
the offline-analytics and LLM-data-pipeline operators the reference
explicitly delegates to its consumers (reference README.md:38-41).

Design stance (SURVEY.md §7.1):
  * Operators are pure functions ``DataFrame -> DataFrame`` — composable,
    batch/stream symmetric, unit-testable.
  * Catalyst does the optimizing: filters/projections are declarative so
    pushdown + pruning are free; dimension joins are explicit broadcasts;
    no ``collect()`` in any operator.
  * UDFs only where expressions can't do the job; always Arrow/pandas
    vectorized, never row-at-a-time Python.
"""

__version__ = "0.1.0"

# Output-record schema version constant, mirroring the reference's build-time
# version stamp (reference main.go:18 `version = "0.0.5"`, event.go:65).
L9_VERSION = "0.0.5"
