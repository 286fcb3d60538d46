"""Per-phase breakdown of the bench's heaviest query families (r15
optimization round, guide §1: measure first).

Each phase is timed with the same methodology as bench.py (noop write,
clearCache + forced GC between phases, min-of-$SPARK_GRAFT_BENCH_REPS)
but cuts the query at its internal seams — signature vs candidate join
vs verify, LSH bucketing vs graph vs connected-components — so the
optimization targets the phase that actually costs, not the query name.

Usage: python scripts/phase_profile.py [family ...]
Families: minhash, cc, emb_lsh, containment, all (default).
Prints one JSON line {"phases": {name: min_sec}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    fams = set(sys.argv[1:]) or {"all"}
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from k8stream_spark.session import get_spark
    from k8stream_spark.sources.fixtures import load_table
    from k8stream_spark.analytics import dedup as docdedup
    from k8stream_spark.analytics import similarity as sim

    spark = get_spark("phase-profile")
    qs = entrymod.queries()
    qs["f5_epoch_seconds"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, float] = {}

    def timed(name: str, build) -> None:
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(None)
        out[name] = round(min(samples), 3)
        print(f"  {out[name]:7.3f}  {name}", file=sys.stderr)

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    if fams & {"minhash", "all"}:
        # signature alone (shingles + xxhash64 + pandas-UDF minima)
        timed(
            "minhash.signature",
            lambda: docdedup.minhash_signature(docs).select("doc_id", "sig"),
        )
        # signature WITHOUT the python UDF (JVM half only)
        def sig_jvm():
            sh = docdedup.word_shingles("text", 3)
            return docs.select("doc_id", sh.alias("shingles")).withColumn(
                "__sh64",
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s)),
            ).select("doc_id", "__sh64")

        timed("minhash.signature_jvm_half", sig_jvm)
        # full pairs pipeline (signature + band join + jaccard verify)
        timed(
            "minhash.pairs_full",
            lambda: docdedup.minhash_lsh_pairs(docs, threshold=0.8),
        )

    if fams & {"cc", "all"}:
        timed(
            "cc.dedup_clusters_full",
            lambda: docdedup.dedup_clusters(docs, threshold=0.8),
        )
        timed(
            "cc.curation_full",
            lambda: docdedup.curation_pipeline(docs, threshold=0.8),
        )

    if fams & {"emb_lsh", "all"}:
        # bucketing alone (vector load + pandas-UDF matmul + explode)
        def buckets_only():
            raw = emb.select(
                F.col("vec_id").alias("__id"),
                F.transform(
                    sim._vec_checked(F.col("embedding"), 64),
                    lambda x: x.cast("double"),
                ).alias("__v"),
            )
            bits, tables = sim._auto_lsh_params(2000)  # sf0.1 corpus size
            return raw.select(
                "__id",
                F.explode(
                    sim.bucket_keys(F.col("__v"), 64, tables, bits)
                ).alias("__bkt"),
            )

        timed("emb.buckets_only", buckets_only)
        timed(
            "emb.knn_graph_lsh_full",
            lambda: sim.knn_graph_mutual_lsh(emb, k=5),
        )
        timed(
            "emb.clusters_lsh_full",
            lambda: sim.semantic_clusters_knn_lsh(emb, k=5),
        )
        timed(
            "emb.near_dup_lsh_full",
            lambda: sim.cosine_near_dup_lsh(emb, threshold=0.85),
        )

    if fams & {"containment", "all"}:
        t = F.coalesce(F.col("text"), F.lit(""))
        k = 8

        def grams_only():
            grams = F.transform(
                F.sequence(F.lit(1), F.length(t) - k + 1),
                lambda i: F.md5(F.substring(t, i, k)),
            )
            kept = F.filter(
                grams,
                lambda h: F.conv(F.substring(h, 1, 8), 16, 10).cast(
                    "bigint"
                )
                % 4
                == 0,
            )
            return docs.where(F.length(t) >= k).select(
                "doc_id", F.explode(kept).alias("__h")
            )

        timed("containment.grams_explode", grams_only)
        timed(
            "containment.grams_distinct",
            lambda: grams_only().distinct(),
        )
        timed(
            "containment.pairs_full",
            lambda: docdedup.containment_pairs(docs),
        )

    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "phases": out}))
    spark.stop()


if __name__ == "__main__":
    main()
