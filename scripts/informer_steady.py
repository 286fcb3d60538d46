"""Steady-state continuous-trigger throughput of the FULL W4 pipeline
on the informer source (r15, VERDICT r14 task 6 / r13 task 7).

STREAM_BENCH's informer numbers are availableNow one-shots (the whole
spool in one micro-batch) — they price setup + bulk replay, not what a
long-lived ingestion service sustains.  This harness runs the complete
reference-parity pipeline (informer DataSourceStreamReader → eligibility
filters → dedup → enrichment joins → L9 projection → gzip NDJSON sink)
under ``processingTime="0 seconds"`` and feeds the spool INCREMENTALLY:
one file is copied in per step, and the next is withheld until progress
shows the previous one consumed — so every data trigger is a clean
single-file batch and the per-trigger latency distribution is exact.

Protocol per BENCH_NOISE.md / the informer_sweep warmup correction: the
binding is WARMED first with an availableNow run of the same pipeline
(state-store init, codegen, Python-worker and Arrow-path spin-up land
there), then measured on a fresh checkpoint + empty spool in the same
session; the first measured trigger is excluded.  Two batch sizes
(25x4k and 5x20k events) separate the per-trigger floor from the
marginal per-event cost.

Docs are counted from progress ``numInputRows`` — valid here because
the gzip NDJSON sink runs exactly ONE action per batch (the gate legs
in stream_steady.py need sink-side counting because their foreachBatch
re-scans; this one doesn't).

Usage: python scripts/informer_steady.py [sf_dir]
Prints one JSON line (key "informer_steady") — merge into
STREAM_BENCH_latest.json under "steady_state_informer".
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from k8stream_spark.session import get_spark  # noqa: E402
from k8stream_spark.streaming.pipeline import (  # noqa: E402
    distributed_json_sink,
    run_pipeline,
)


def data_progress(q) -> list[dict]:
    return [
        p
        for p in (json.loads(x.json) for x in q.recentProgress)
        if p["numInputRows"] > 0
    ]


def leg_stats(prog: list[dict]) -> dict:
    durs = sorted(
        p["durationMs"]["triggerExecution"] / 1000.0 for p in prog[1:]
    )
    rows = sum(p["numInputRows"] for p in prog[1:])
    wall = sum(durs)
    return {
        "triggers": len(prog),
        "events": rows,
        "sustained_events_per_sec": round(rows / max(wall, 1e-9), 1),
        "trigger_sec_p50": round(durs[len(durs) // 2], 3),
        "trigger_sec_p90": round(durs[int(len(durs) * 0.9)], 3),
        "trigger_sec_min": round(durs[0], 3),
        "trigger_sec_max": round(durs[-1], 3),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("informer-steady")
    work = tempfile.mkdtemp(prefix="inf-steady-")
    out: dict = {
        "metric": "informer_steady",
        "sf_dir": sf_dir,
        "trigger": "processingTime=0s",
        "source": "informer",
        "legs": {},
    }

    events = entrymod._k8s_events(spark, sf_dir)
    n = events.count()
    objects = entrymod._objects(spark, sf_dir)
    nodes = entrymod._nodes(spark, sf_dir)

    # Warm the binding: availableNow over the full spool (same pipeline,
    # throwaway checkpoint) — first-run state/codegen setup lands here.
    warm_src = f"{work}/warm-src"
    events.write.mode("overwrite").json(warm_src)
    t0 = time.time()
    q = run_pipeline(
        spark, warm_src, objects, nodes,
        sink_fn=distributed_json_sink(f"{work}/warm-out", compress_gzip=True),
        checkpoint_dir=f"{work}/warm-ckpt",
        available_now=True, namespaces=(), reasons=(),
        source_format="informer",
    )
    q.awaitTermination(600)
    q.stop()
    out["warm_available_now_sec"] = round(time.time() - t0, 2)

    for nf in (25, 5):
        staged = f"{work}/staged-{nf}"
        events.repartition(nf).write.mode("overwrite").json(staged)
        files = sorted(glob.glob(f"{staged}/part-*.json"))
        live = f"{work}/live-{nf}"
        os.makedirs(live, exist_ok=True)
        q = run_pipeline(
            spark, live, objects, nodes,
            sink_fn=distributed_json_sink(
                f"{work}/out-{nf}", compress_gzip=True
            ),
            checkpoint_dir=f"{work}/ckpt-{nf}",
            trigger_seconds=0, namespaces=(), reasons=(),
            source_format="informer",
        )
        consumed = 0
        t_leg = time.time()
        for i, f in enumerate(files):
            # atomic appearance: copy to a temp name, rename into place
            tmp = os.path.join(live, f".tmp-{i}")
            shutil.copyfile(f, tmp)
            os.rename(tmp, os.path.join(live, f"ev-{i:04d}.json"))
            deadline = time.time() + 120
            while time.time() < deadline:
                prog = data_progress(q)
                if len(prog) > consumed:
                    consumed = len(prog)
                    break
                time.sleep(0.05)
        prog = data_progress(q)
        q.stop()
        out["legs"][f"pipeline@{nf}x{n // nf}"] = leg_stats(prog)
        out["legs"][f"pipeline@{nf}x{n // nf}"]["leg_wall_sec"] = round(
            time.time() - t_leg, 2
        )

    out["events_total"] = n
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
