"""Same-session A/B for the streaming near-dup gate speedup (r10 task
5): OLD path (per-batch reference re-banding, shuffle joins — what the
gate did through r11) vs NEW path (persisted ref band table +
micro-batch broadcast).  Interleaved O N O N warm legs, min per
variant, identical admissions asserted — the paired-legs protocol from
the informer sweep (cross-session streaming numbers are not
comparable; see BENCH_NOISE.md).

Usage: python scripts/neardup_ab.py [sf_dir]
Prints one JSON line.
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

from k8stream_spark.analytics.dedup import (  # noqa: E402
    incremental_dedup,
    minhash_band_table,
    minhash_signature,
)
from k8stream_spark.session import get_spark  # noqa: E402
from k8stream_spark.sources.fixtures import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("neardup-ab")
    work = tempfile.mkdtemp(prefix="neardup-ab-")
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.where((F.col("doc_id") % 2) == 0)
    new = docs.where((F.col("doc_id") % 2) == 1)
    n_docs = new.count()
    doc_src = f"{work}/docsrc"
    new.write.mode("overwrite").json(doc_src)

    ref_sigs = minhash_signature(ref, "text", 128, 3).persist()
    ref_sigs.count()
    ref_hashes = (
        ref.select(F.md5(F.col("text")).alias("__h")).distinct().persist()
    )
    ref_hashes.count()
    ref_bands = minhash_band_table(ref_sigs, "ref_id", 128, 32).persist()
    ref_bands.count()

    admissions: dict[str, int] = {}

    def make_fn(variant: str):
        def fn(batch_df, _bid):
            audited = incremental_dedup(
                batch_df,
                ref,
                ref_sigs=ref_sigs,
                ref_hashes=ref_hashes,
                ref_bands=ref_bands if variant == "new" else None,
                broadcast_new=(variant == "new"),
            )
            admissions[variant] = admissions.get(variant, 0) + int(
                audited.where("kept").count()
            )
        return fn

    def run(variant: str, tag: str) -> float:
        stream = spark.readStream.schema(new.schema).json(doc_src)
        ckpt = f"{work}/ckpt-{tag}"
        t0 = time.time()
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(make_fn(variant))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        return time.time() - t0

    # cold warms the session for both variants; discard
    run("old", "warmup-old")
    run("new", "warmup-new")
    admissions.clear()

    best: dict[str, float] = {}
    for rep in (1, 2):
        for variant in ("old", "new"):
            t = run(variant, f"{variant}-w{rep}")
            best[variant] = min(best.get(variant, float("inf")), t)

    assert admissions["old"] == admissions["new"], admissions
    out = {
        "metric": "neardup_gate_ab",
        "docs_in": n_docs,
        "reps": "min-of-2 interleaved, warm",
        "old_sec": round(best["old"], 2),
        "new_sec": round(best["new"], 2),
        "old_docs_per_sec": round(n_docs / best["old"], 1),
        "new_docs_per_sec": round(n_docs / best["new"], 1),
        "speedup": round(best["old"] / best["new"], 2),
        "admissions_equal": True,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
