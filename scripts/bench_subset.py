"""Isolated-subset bench for regression bisects: same methodology as
bench.py (noop write, clearCache + forced GC between reps, min-of-N)
over an explicit query list, with an optional ``--lazy`` flag that
flips ``analytics._cache.EAGER`` off — the A/B for the r8 question of
whether eager localCheckpoint finalize costs the per-query bench path.

Usage: python scripts/bench_subset.py [--lazy] q1 q2 ...
Prints one JSON line {"eager": bool, "queries": {name: min_sec}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:
    args = sys.argv[1:]
    lazy = "--lazy" in args
    names = [a for a in args if not a.startswith("--")]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if lazy:
        # Imported lazily so the harness also runs inside a git worktree
        # of a pre-_cache round (the cross-round bisect workflow).
        from k8stream_spark.analytics import _cache

        _cache.EAGER = False
    import __spark_entry__ as entrymod
    from k8stream_spark.session import get_spark

    spark = get_spark("bench-subset")
    qs = entrymod.queries()
    qs["f5_epoch_seconds"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    spreads = {}
    for name in names:
        samples = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        out[name] = round(min(samples), 3)
        # r16: the r15 pathologies were bimodal WITHIN a run (min
        # healthy, median/max 2-8x) — min alone can't see them; the
        # raw rep sequence additionally separates positional effects
        # (first-rep codegen) from genuinely random slow modes.
        spreads[name] = [round(s, 3) for s in samples]
    print(
        json.dumps(
            {"eager": not lazy, "queries": out, "med_max": spreads}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
