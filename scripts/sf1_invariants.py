"""Independent sf1 checks for the queries whose DuckDB oracle replay
is spill-bound at 6M-row scale (r13, VERDICT r12 task 2).

Each previously `spark-rows-only` entry gets a check that does NOT
re-run the DuckDB replica: either a pinned mathematical invariant, an
exact recomputation of the derived quantity from independently-checked
parts, or a second independent implementation (driver-side union-find
for the connected-components closure).  Everything here is
engine-independent — a failure means the ENGINE is wrong, not the
oracle environment.

Checks (query -> what is verified):

* docs_minhash_recall_report  -> n_exact_pairs equals the pair count of
  the independently-oracled ngram_jaccard_pairs; n_caught <= n_exact;
  recall == round(n_caught/n_exact, 6) and >= 0.95 (S-curve floor at
  J>=0.8, b=16, r=4: theory >= 0.9997).
* emb_cosine_topk_ivf         -> exactly k rows per query, ranks 1..k,
  and every listed cosine equals the EXACT recomputed cosine of that
  (query, neighbor) pair (same rounding).
* emb_ivf_recall_report       -> recomputed from its parts: recall ==
  |ivf_topk ∩ exact_topk| / |exact_topk| per query, bit-equal.
* emb_ivf_pq_topk             -> k rows per query, ranks 1..k, run-to-
  run determinism (two independent plans, identical rows).
* emb_ivfpq_recall_report     -> recomputed from ivf_pq_topk ∩ exact.
* emb_knn_graph_mutual_lsh    -> every edge's cosine equals the exact
  recompute; id_a < id_b, no duplicate pairs, per-node degree <= k.
* emb_cosine_near_dup_lsh     -> every output pair's cosine equals the
  exact recompute, >= threshold, id_a < id_b, no duplicates (the
  tuned-params oracle outgrew the DuckDB envelope at sf1 in r13: its
  signature stage is n·dim·tables·bits ~ 1.5B intermediate rows).
* emb_semantic_clusters_lsh   -> labels equal a DRIVER-SIDE UNION-FIND
  over the mutual-LSH edge list (a second implementation of the
  closure — the exact step DuckDB spills on), plus partition checks.
* docs_semantic_dedup         -> already covered by the registered
  docs_semantic_dedup_invariants query (sf1-green); re-asserted here:
  n_vectors == corpus size, zero violations.

Usage: python scripts/sf1_invariants.py [sf_dir]
Prints one PASS/FAIL line per check + a JSON summary; exit 0 = green.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from k8stream_spark.analytics import dedup as dd  # noqa: E402
from k8stream_spark.analytics import similarity as sim  # noqa: E402
from k8stream_spark.session import get_spark  # noqa: E402
from k8stream_spark.sources.fixtures import load_table  # noqa: E402

RESULTS: dict[str, str] = {}


def record(name: str, ok: bool, detail: str = "") -> None:
    RESULTS[name] = "PASS" if ok else f"FAIL {detail}"
    print(f"{'PASS' if ok else 'FAIL'} {name:34s} {detail}")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    spark = get_spark("sf1-invariants")
    qs = entrymod.queries()
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")

    # ---- docs_minhash_recall_report ------------------------------------
    rep = qs["docs_minhash_recall_report"](spark, sf_dir).collect()[0]
    true_pairs = dd.ngram_jaccard_pairs(docs, threshold=0.8).count()
    rc_ok = (
        rep.n_exact_pairs == true_pairs
        and rep.n_caught <= rep.n_exact_pairs
        and rep.recall is not None
        and abs(rep.recall - round(rep.n_caught / rep.n_exact_pairs, 6))
        < 1e-12
        and rep.recall >= 0.95
    )
    record(
        "docs_minhash_recall_report",
        rc_ok,
        f"n_exact={rep.n_exact_pairs} (independent={true_pairs}) "
        f"recall={rep.recall}",
    )
    spark.catalog.clearCache()

    # ---- exact top-k panel (shared ground truth; O(q·n), not O(n²)) ----
    qids = entrymod.TOPK_QUERY_IDS
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.cosine_topk(emb, qids, k=10).collect()
    }

    def topk_shape_and_cosines(name: str, verify_cosine: bool):
        rows = qs[name](spark, sf_dir).collect()
        spark.catalog.clearCache()
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        shape_ok = len(rows) == 10 * len(qids) and all(
            sorted(x.rank for x in v) == list(range(1, 11))
            for v in by_q.values()
        )
        cos_ok = True
        if verify_cosine:
            pairs = spark.createDataFrame(
                [(r.query_id, r.neighbor_id, float(r.cosine)) for r in rows],
                "query_id bigint, neighbor_id bigint, listed double",
            )
            base = emb.select(
                F.col("vec_id"),
                F.transform(
                    F.col("embedding"), lambda x: x.cast("double")
                ).alias("__v"),
            )
            qv = base.select(
                F.col("vec_id").alias("query_id"), F.col("__v").alias("__q")
            )
            nv = base.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("__v").alias("__n"),
            )
            cos = sim._dot(F.col("__q"), F.col("__n")) / (
                sim._norm(F.col("__q")) * sim._norm(F.col("__n"))
            )
            bad = (
                pairs.join(qv, "query_id")
                .join(nv, "neighbor_id")
                .where(F.round(cos, 6) != F.col("listed"))
                .count()
            )
            cos_ok = bad == 0
            spark.catalog.clearCache()
        return rows, shape_ok, cos_ok

    ivf_rows, shape_ok, cos_ok = topk_shape_and_cosines(
        "emb_cosine_topk_ivf", verify_cosine=True
    )
    record(
        "emb_cosine_topk_ivf",
        shape_ok and cos_ok,
        f"shape={shape_ok} exact_cosine_recompute={cos_ok}",
    )

    # ---- emb_ivf_recall_report == recomputed from parts ---------------
    ivf_pairs = {(r.query_id, r.neighbor_id) for r in ivf_rows}
    rep_rows = qs["emb_ivf_recall_report"](spark, sf_dir).collect()
    spark.catalog.clearCache()
    ok = len(rep_rows) == len(qids)
    for r in rep_rows:
        ex_q = {n for (q, n) in exact if q == r.query_id}
        hits = len(ex_q & {n for (q, n) in ivf_pairs if q == r.query_id})
        ok = ok and (
            r.n_exact == len(ex_q)
            and r.n_hits == hits
            and abs(r.recall - round(hits / len(ex_q), 6)) < 1e-12
        )
    record("emb_ivf_recall_report", ok, f"panel={len(rep_rows)}")

    # ---- emb_ivf_pq_topk: shape + determinism --------------------------
    pq1, shape_ok, _ = topk_shape_and_cosines(
        "emb_ivf_pq_topk", verify_cosine=False
    )
    pq2, _, _ = topk_shape_and_cosines("emb_ivf_pq_topk", verify_cosine=False)
    det_ok = sorted(map(tuple, pq1)) == sorted(map(tuple, pq2))
    record(
        "emb_ivf_pq_topk", shape_ok and det_ok,
        f"shape={shape_ok} deterministic={det_ok}",
    )

    # ---- emb_ivfpq_recall_report == recomputed from parts --------------
    pq_pairs = {(r.query_id, r.neighbor_id) for r in pq1}
    rep_rows = qs["emb_ivfpq_recall_report"](spark, sf_dir).collect()
    spark.catalog.clearCache()
    ok = len(rep_rows) == len(qids)
    for r in rep_rows:
        ex_q = {n for (q, n) in exact if q == r.query_id}
        hits = len(ex_q & {n for (q, n) in pq_pairs if q == r.query_id})
        ok = ok and (
            r.n_exact == len(ex_q)
            and r.n_hits == hits
            and abs(r.recall - round(hits / len(ex_q), 6)) < 1e-12
        )
    record("emb_ivfpq_recall_report", ok, f"panel={len(rep_rows)}")

    # ---- emb_knn_graph_mutual_lsh --------------------------------------
    edges = qs["emb_knn_graph_mutual_lsh"](spark, sf_dir).persist()
    n_edges = edges.count()
    ordered_ok = edges.where(
        (F.col("id_a") >= F.col("id_b"))
    ).count() == 0
    dup_ok = edges.select("id_a", "id_b").distinct().count() == n_edges
    deg = (
        edges.select(F.col("id_a").alias("v"))
        .unionAll(edges.select(F.col("id_b").alias("v")))
        .groupBy("v")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    base = emb.select(
        F.col("vec_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "__v"
        ),
    ).withColumn("__n", F.sqrt(sim._dot_fixed(F.col("__v"), F.col("__v"), 64)))
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    exact_cos = sim._dot_fixed(F.col("__va"), F.col("__vb"), 64) / (
        F.col("__na") * F.col("__nb")
    )
    bad_cos = (
        edges.join(a, "id_a")
        .join(b, "id_b")
        .where(F.round(exact_cos, 6) != F.col("cosine"))
        .count()
    )
    record(
        "emb_knn_graph_mutual_lsh",
        ordered_ok and dup_ok and (deg is None or deg <= 5) and bad_cos == 0,
        f"edges={n_edges} max_degree={deg} bad_cosines={bad_cos}",
    )

    # ---- emb_cosine_near_dup_lsh -----------------------------------------
    nd = qs["emb_cosine_near_dup_lsh"](spark, sf_dir).persist()
    n_nd = nd.count()
    nd_ordered_ok = nd.where(F.col("id_a") >= F.col("id_b")).count() == 0
    nd_dup_ok = nd.select("id_a", "id_b").distinct().count() == n_nd
    nd_bad = (
        nd.join(a, "id_a")
        .join(b, "id_b")
        .where(
            (F.round(exact_cos, 6) != F.col("cosine"))
            # 1e-9 slack: the operator thresholds the unit-vector
            # einsum; this recomputes raw-dot/(na*nb) — same value up
            # to one rounding step (A/B at sf1: identical pair sets)
            | (exact_cos < F.lit(0.45) - F.lit(1e-9))
        )
        .count()
    )
    nd.unpersist()
    spark.catalog.clearCache()
    record(
        "emb_cosine_near_dup_lsh",
        nd_ordered_ok and nd_dup_ok and nd_bad == 0,
        f"pairs={n_nd} bad_rows={nd_bad}",
    )

    # ---- emb_semantic_clusters_lsh: driver union-find over the edges ---
    edge_list = [(r.id_a, r.id_b) for r in edges.select("id_a", "id_b").collect()]
    edges.unpersist()
    labels = {
        r.vec_id: (r.cluster_id, r.is_canonical)
        for r in qs["emb_semantic_clusters_lsh"](spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    n_vec = emb.count()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ea, eb in edge_list:
        ra, rb = find(ea), find(eb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want: dict[int, int] = {}
    for v in labels:
        want[v] = find(v)
    # normalize union-find roots to min member id per component
    comp_min: dict[int, int] = {}
    for v, r in want.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    uf_ok = (
        len(labels) == n_vec
        and all(
            labels[v][0] == comp_min[r] and labels[v][1] == (v == comp_min[r])
            for v, r in want.items()
        )
    )
    record(
        "emb_semantic_clusters_lsh", uf_ok,
        f"n={len(labels)} union-find replay over {len(edge_list)} edges",
    )

    # ---- docs_semantic_dedup via its registered invariants query -------
    inv = qs["docs_semantic_dedup_invariants"](spark, sf_dir).collect()[0]
    record(
        "docs_semantic_dedup",
        inv.n_vectors == n_vec
        and inv.same_cell_missed_pairs == 0
        and inv.dup_without_pointer == 0,
        f"n_vectors={inv.n_vectors} missed={inv.same_cell_missed_pairs} "
        f"dangling={inv.dup_without_pointer}",
    )

    print(json.dumps({"sf_dir": sf_dir, "results": RESULTS}))
    spark.stop()
    return 1 if any(v != "PASS" for v in RESULTS.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
