"""LSH regime probe: recall + candidate volume, isotropic vs clustered
(r15, the LSH half of VERDICT r14 task 3).

For each fixture dir, runs the REAL ``cosine_topk_lsh`` at the
auto-tuned (bits, tables) and reports recall@10 against a numpy exact
baseline plus the CANDIDATE VOLUME the bucket join generated per query
(distinct candidate ids — the number of exact reranks paid).  Random
hyperplanes don't follow the data, so unlike IVF the candidate volume
is the interesting clustered-regime number: a query's cluster-mates
collide with it in most tables, so candidates/query should approach
the cluster size while recall rises.

Usage: python scripts/lsh_regime_probe.py [sf_dir ...]
One JSON line per fixture.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from k8stream_spark.analytics import similarity  # noqa: E402

QIDS = (0, 1, 2, 3, 4)
K = 10


def exact_topk(X: np.ndarray, ids: np.ndarray) -> dict[int, set[int]]:
    U = X / np.linalg.norm(X, axis=1, keepdims=True)
    out = {}
    for q in QIDS:
        qi = int(np.where(ids == q)[0][0])
        cos = np.round(U @ U[qi], 6)
        order = np.lexsort((ids, -cos))
        top = [int(ids[j]) for j in order if int(ids[j]) != q][:K]
        out[q] = set(top)
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/root/repo/.scale/sf0.1c",
        "/root/repo/.scale/sf1",
        "/root/repo/.scale/sf1c",
    ]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("lsh-regime-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sf_dirs:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pdf = emb.select("vec_id", "embedding").toPandas()
        ids = pdf["vec_id"].to_numpy()
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        n = len(ids)
        exact = exact_topk(X, ids)
        bits, tables = similarity._auto_lsh_params(n)

        # candidate volume: the same bucket construction the operator
        # uses, counted at the (query, candidate) dedup point
        vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        base = emb.select(
            F.col("vec_id").alias("__id"), vec_d.alias("__v")
        ).persist()
        base.count()
        bucketed = base.select(
            "__id",
            F.explode(
                similarity.bucket_keys(F.col("__v"), 64, tables, bits)
            ).alias("__bkt"),
        ).persist()
        bucketed.count()
        qb = bucketed.where(F.col("__id").isin(*QIDS)).select(
            F.col("__id").alias("query_id"), "__bkt"
        )
        cand_counts = {
            int(r["query_id"]): int(r["c"])
            for r in (
                F.broadcast(qb)
                .join(bucketed, "__bkt")
                .where(F.col("__id") != F.col("query_id"))
                .select("query_id", "__id")
                .distinct()
                .groupBy("query_id")
                .agg(F.count("*").alias("c"))
                .collect()
            )
        }
        rows = similarity.cosine_topk_lsh(emb, QIDS, k=K).collect()
        got: dict[int, set[int]] = {q: set() for q in QIDS}
        for r in rows:
            got[int(r["query_id"])].add(int(r["neighbor_id"]))
        recalls = [
            round(len(got[q] & exact[q]) / max(1, len(exact[q])), 3)
            for q in QIDS
        ]
        cands = [cand_counts.get(q, 0) for q in QIDS]
        base.unpersist()
        bucketed.unpersist()
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n": n,
                    "bits": bits,
                    "tables": tables,
                    "recalls": recalls,
                    "mean_recall": round(float(np.mean(recalls)), 3),
                    "cand_per_query": cands,
                    "cand_frac_mean": round(
                        float(np.mean(cands)) / max(1, n - 1), 4
                    ),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
