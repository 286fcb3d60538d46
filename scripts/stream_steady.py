"""Steady-state continuous-trigger throughput for the streaming gates
(r13, VERDICT r12 task 4).

The committed STREAM_BENCH numbers run ``trigger(availableNow=True)``,
whose end-to-end docs/s is floored by the one-shot micro-batch
machinery (~1.2 s/trigger measured via the trivial-gate control in
r12).  This harness measures what a long-lived ingestion service
actually sustains: a ``processingTime="0 seconds"`` query consuming a
file-per-trigger stream back-to-back, reporting sustained docs/s plus
the per-trigger latency distribution from the query's own progress
events (triggerExecution durationMs).

Protocol per BENCH_NOISE.md: each gate leg is WARMED first with an
availableNow run of the same binding (state-store init, codegen,
Python-worker spin-up land there), then measured on a fresh checkpoint
in the same session; the first measured trigger is excluded from the
sustained rate.  Three legs, same input stream:

* control   — trivial foreachBatch (count only): the machinery floor
* neardup   — near_dup_gate_sink (persisted ref band table, broadcast
              micro-batch — the production LSH admission gate)
* quota     — quota_gate_stateful (applyInPandasWithState, per-source
              admission cap)

Usage: python scripts/stream_steady.py [sf_dir] [n_files]
Prints one JSON line; also appended to STREAM_BENCH_latest.json under
key "steady_state" by scripts/stream_bench.py consumers (this script
only prints).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from k8stream_spark.session import get_spark  # noqa: E402
from k8stream_spark.sources.fixtures import load_table  # noqa: E402
from k8stream_spark.streaming.pipeline import near_dup_gate_sink  # noqa: E402
from k8stream_spark.streaming.stateful import quota_gate_stateful  # noqa: E402

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string"


def drain(q, n_files: int, timeout_s: float = 600.0) -> list[dict]:
    """Wait until the query has consumed all ``n_files`` triggers (plus
    a confirming empty trigger), then stop it and return its progress
    dicts (one per trigger, data triggers only)."""
    t0 = time.time()
    seen_rows = 0
    idle = 0
    while time.time() - t0 < timeout_s:
        time.sleep(0.2)
        prog = [json.loads(p.json) for p in q.recentProgress]
        seen_rows = sum(p["numInputRows"] for p in prog)
        if prog and prog[-1]["numInputRows"] == 0:
            idle += 1
        else:
            idle = 0
        data_trigs = sum(1 for p in prog if p["numInputRows"] > 0)
        if data_trigs >= n_files and idle >= 2:
            break
    prog = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    return [p for p in prog if p["numInputRows"] > 0]


def leg_stats(prog: list[dict], sink_rows: dict[int, int]) -> dict:
    """Sustained rate over triggers 2..N (first measured trigger still
    carries per-query setup) + per-trigger latency distribution.

    Docs are counted at the SINK (rows the foreachBatch actually
    received), not from numInputRows: a gate whose foreachBatch runs
    more than one action re-scans the source and progress double-counts
    the input (observed 2× on the near-dup leg).

    ``sink_rows`` is keyed by batchId and each progress entry is matched
    by ITS OWN batchId (ADVICE r13: the previous positional slice
    assumed sink calls aligned index-for-index with data triggers —
    recentProgress is capped at ~100 entries and interleaves empty
    triggers, so the slice could silently sum the wrong triggers' rows
    once either effect kicked in)."""
    durs = sorted(
        p["durationMs"]["triggerExecution"] / 1000.0 for p in prog[1:]
    )
    rows = sum(sink_rows.get(p["batchId"], 0) for p in prog[1:])
    wall = sum(durs)
    return {
        "triggers": len(prog),
        "docs": rows,
        "sustained_docs_per_sec": round(rows / max(wall, 1e-9), 1),
        "trigger_sec_p50": round(durs[len(durs) // 2], 3),
        "trigger_sec_p90": round(durs[int(len(durs) * 0.9)], 3),
        "trigger_sec_min": round(durs[0], 3),
        "trigger_sec_max": round(durs[-1], 3),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark("stream-steady")
    work = tempfile.mkdtemp(prefix="steady-")
    out: dict = {"metric": "stream_steady", "sf_dir": sf_dir,
                 "n_files": n_files, "trigger": "processingTime=0s",
                 "legs": {}}

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.where((F.col("doc_id") % 2) == 0)
    new = docs.where((F.col("doc_id") % 2) == 1).select(
        "doc_id", "text", "lang", "source"
    )
    n_docs = new.count()

    sink_counts: dict[int, int] = {}

    def count_sink(df, bid):
        # keyed by batchId; overwrite (not +=) so a retried batch does
        # not double-count
        sink_counts[int(bid)] = df.count()

    # ---- near-dup gate artifacts (once per corpus version) ----
    t0 = time.time()
    gate_fn = near_dup_gate_sink(ref, count_sink)
    prep_s = round(time.time() - t0, 2)

    # Two batch sizes per leg: small triggers price the per-trigger
    # floor, large triggers show the amortized steady-state rate; the
    # marginal per-doc cost falls out of the two points.
    for nf in (n_files, max(2, n_files // 5)):
        src = f"{work}/src-{nf}"
        new.repartition(nf).write.mode("overwrite").json(src)

        def stream_df():
            return (
                spark.readStream.schema(DOC_SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .json(src)
            )

        def run(name: str, build_writer):
            q = build_writer(f"{work}/ck-{name}-{nf}-warm", True)
            q.awaitTermination(600)
            q.stop()
            sink_counts.clear()
            q = build_writer(f"{work}/ck-{name}-{nf}", False)
            prog = drain(q, nf)
            out["legs"][f"{name}@{nf}x{n_docs // nf}"] = leg_stats(
                prog, dict(sink_counts)
            )

        def control_writer(ck, available_now):
            w = (
                stream_df().writeStream.outputMode("append")
                .foreachBatch(count_sink)
                .option("checkpointLocation", ck)
            )
            w = w.trigger(availableNow=True) if available_now else w.trigger(
                processingTime="0 seconds"
            )
            return w.start()

        def neardup_writer(ck, available_now):
            w = (
                stream_df().writeStream.outputMode("append")
                .foreachBatch(gate_fn)
                .option("checkpointLocation", ck)
            )
            w = w.trigger(availableNow=True) if available_now else w.trigger(
                processingTime="0 seconds"
            )
            return w.start()

        def quota_writer(ck, available_now):
            gated = quota_gate_stateful(stream_df(), quota=10_000)
            w = (
                gated.writeStream.outputMode("update")
                .foreachBatch(count_sink)
                .option("checkpointLocation", ck)
            )
            w = w.trigger(availableNow=True) if available_now else w.trigger(
                processingTime="0 seconds"
            )
            return w.start()

        run("control", control_writer)
        run("neardup", neardup_writer)
        run("quota", quota_writer)

    out["neardup_ref_prep_sec"] = prep_s
    out["n_docs_stream"] = n_docs
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
