"""Calibrate the IVF auto-nprobe law (r14 task 1, VERDICT r13).

Runs the REAL ``cosine_topk_ivf`` (integer-exact sample quantizer) at a
given fixture dir over a sweep of nprobe values, measuring recall@10
per query against a numpy exact baseline (same 6-dp rounding + id
tiebreak as ``cosine_topk``).  Output: one JSON line per (n, nlist,
nprobe) with per-query recalls + mean — the measurement behind the
``suggest_ivf_nprobe`` calibration constant.

Usage: python scripts/ivf_nprobe_sweep.py [sf_dir ...] [--nprobes 8,14,21,28]
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dirs", nargs="*", default=None)
    ap.add_argument("--nprobes", default="")
    ap.add_argument("--law", action="store_true",
                    help="also measure the r15 structure-adaptive "
                         "default: margin statistic, the law's nprobe "
                         "pick, and recall at that pick (nprobe=None)")
    args = ap.parse_args()
    sf_dirs = args.sf_dirs or ["/root/testdata/sf0.1", "/root/repo/.scale/sf1"]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("ivf-nprobe-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sf_dirs:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pdf = emb.select("vec_id", "embedding").toPandas()
        ids = pdf["vec_id"].to_numpy()
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        n = len(ids)
        nlist = max(4, int(n**0.5 / 2))
        exact = exact_topk(X, ids)
        if args.law:
            from pyspark.sql import functions as F

            raw = F.transform(F.col("embedding"), lambda x: x.cast("double"))
            base = emb.select(
                F.col("vec_id").alias("__id"), raw.alias("__x")
            )
            C, Xs = similarity._sample_kmeans_int(
                base, nlist, n, return_sample=True
            )
            margin = similarity._ivf_sample_margin_micro(Xs, C)
            pick = similarity.suggest_ivf_nprobe(nlist, margin_micro=margin)
            rows = similarity.cosine_topk_ivf(emb, QIDS, k=K).collect()
            got = {q: set() for q in QIDS}
            for r in rows:
                got[int(r["query_id"])].add(int(r["neighbor_id"]))
            recalls = [
                round(len(got[q] & exact[q]) / max(1, len(exact[q])), 3)
                for q in QIDS
            ]
            print(json.dumps({
                "sf_dir": sf_dir, "n": n, "nlist": nlist,
                "margin_micro": margin, "law_nprobe": pick,
                "frac": round(pick / nlist, 3),
                "recalls": recalls,
                "mean": round(float(np.mean(recalls)), 3),
                "mode": "law",
            }), flush=True)
        if args.nprobes:
            nprobes = [int(x) for x in args.nprobes.split(",")]
        else:
            nprobes = sorted(
                {8, nlist // 5, nlist * 2 // 5, nlist * 3 // 5, nlist}
            )
        for nprobe in nprobes:
            nprobe = max(1, min(nlist, nprobe))
            rows = similarity.cosine_topk_ivf(
                emb, QIDS, k=K, nprobe=nprobe
            ).collect()
            got: dict[int, set[int]] = {q: set() for q in QIDS}
            for r in rows:
                got[int(r["query_id"])].add(int(r["neighbor_id"]))
            recalls = [
                round(len(got[q] & exact[q]) / max(1, len(exact[q])), 3)
                for q in QIDS
            ]
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "n": n,
                        "nlist": nlist,
                        "nprobe": nprobe,
                        "frac": round(nprobe / nlist, 3),
                        "recalls": recalls,
                        "mean": round(float(np.mean(recalls)), 3),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
