"""Sweep the informer's rowsPerPartition task-sizing target (r8 verdict
item 7): render the sf events as a JSON spool, then for each target run
the FULL W4 pipeline on the informer binding (the stream_bench shape)
and report events/s.  Target 0 = no repacking (one task per raw file
range — the pre-r9 behavior).

Usage: python scripts/informer_sweep.py [sf_dir] [targets...]
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
    targets = [int(a) for a in sys.argv[2:]] or [0, 4096, 16384, 65536]
    work = tempfile.mkdtemp(prefix="isweep-")
    spark = get_spark("informer-sweep")

    events = entrymod._k8s_events(spark, sf_dir)
    n = events.count()
    src = f"{work}/src"
    events.write.mode("overwrite").json(src)
    objects = entrymod._objects(spark, sf_dir)
    nodes = entrymod._nodes(spark, sf_dir)

    import k8stream_spark.sources.informer as informer_mod

    # One UNTIMED warm run first: the first streaming pipeline in a
    # session pays state-store init, codegen and page-cache costs that
    # dwarf any task-sizing effect (the r9 first sweep ran targets in
    # ascending order and mistook this warmup for a 3x packing win —
    # interleaved reruns showed warm runs at ~1.4-1.5 s for target 0
    # AND 16384 alike).  Measure warm, interleave targets.
    warm = run_pipeline(
        spark, src, objects, nodes,
        sink_fn=distributed_json_sink(f"{work}/out-warm", compress_gzip=True),
        checkpoint_dir=f"{work}/ckpt-warm",
        available_now=True, namespaces=(), reasons=(),
        source_format="informer",
    )
    if not warm.awaitTermination(600):
        warm.stop()
        raise RuntimeError("warmup run did not finish")

    for target in targets:
        # The pipeline builds the stream itself; steer the source
        # default for this run.
        orig = informer_mod.informer_stream

        def patched(spark_, d, kind="event", resync_interval=0, **kw):
            return orig(
                spark_, d, kind=kind, resync_interval=resync_interval,
                rows_per_partition=target,
            )

        informer_mod.informer_stream = patched
        try:
            t0 = time.time()
            q = run_pipeline(
                spark,
                src,
                objects,
                nodes,
                sink_fn=distributed_json_sink(
                    f"{work}/out-{target}", compress_gzip=True
                ),
                checkpoint_dir=f"{work}/ckpt-{target}",
                available_now=True,
                namespaces=(),
                reasons=(),
                source_format="informer",
            )
            if not q.awaitTermination(600):
                q.stop()
                raise RuntimeError("informer sweep run did not finish")
            elapsed = time.time() - t0
        finally:
            informer_mod.informer_stream = orig
        print(
            json.dumps(
                {
                    "rows_per_partition": target,
                    "events_in": n,
                    "seconds": round(elapsed, 2),
                    "events_per_sec": round(n / elapsed, 1),
                }
            ),
            flush=True,
        )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
