"""Unit tests for the retrieval layer (BM25 + hybrid RRF) on crafted
corpora where the ranking behavior is predictable by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k8stream_spark.analytics import retrieval


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_matching_docs_only(spark):
    docs = _docs(
        spark,
        [
            (1, "spark join spark join spark"),
            (2, "spark filter filter filter filter"),
            (3, "filter scan merge sort group"),
            (4, "join vector hash spark join"),
        ],
    )
    out = retrieval.bm25_topk(docs, ("spark", "join", "vector", "hash"), k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 3 has no query terms at all: absent from the candidate set.
    assert set(rows) == {1, 2, 4}
    assert rows[4]["n_hit_terms"] == 4
    assert rows[1]["n_hit_terms"] == 2
    assert rows[2]["n_hit_terms"] == 1
    # doc 4 hits all four terms and shares doc length with 1/2: it must
    # outrank both (each term factor is positive).
    assert rows[4]["rank"] == 1
    # ranks are 1..n dense and ordered by the score.
    ordered = sorted(rows.values(), key=lambda r: r["rank"])
    assert [r["rank"] for r in ordered] == [1, 2, 3]
    scores = [r["bm25_micro"] for r in ordered]
    assert scores == sorted(scores, reverse=True)


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # Same tf for the query term, different doc lengths: BM25's length
    # normalization must rank the shorter document higher.
    docs = _docs(
        spark,
        [
            (1, "spark spark scan"),
            (2, "spark spark " + " ".join(["scan"] * 40)),
        ],
    )
    out = retrieval.bm25_topk(docs, ("spark",), k=10).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["bm25_micro"] > by_id[2]["bm25_micro"]
    assert by_id[1]["rank"] == 1


def test_bm25_k_truncates(spark):
    docs = _docs(spark, [(i, "spark " + "pad " * i) for i in range(1, 8)])
    out = retrieval.bm25_topk(docs, ("spark",), k=3)
    assert out.count() == 3
    assert [r["rank"] for r in out.orderBy("rank").collect()] == [1, 2, 3]


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_hybrid_rrf_sums_both_lists(spark):
    # doc 1: strong lexically AND semantically (identical direction to
    # the query vector); doc 2: lexical only; doc 3: semantic only.
    docs = _docs(
        spark,
        [
            (1, "spark join vector hash"),
            (2, "spark join vector hash pad pad"),
            (3, "scan merge filter sort"),
        ],
    )
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0]),   # the query vector
            (1, [2.0, 0.0]),   # cosine 1.0
            (2, [0.0, 1.0]),   # cosine 0.0
            (3, [1.0, 1.0]),   # cosine ~0.707
        ],
    )
    out = retrieval.hybrid_rrf(docs, emb, k=10).collect()
    rows = {r["doc_id"]: r for r in out}
    # doc 1 leads both lists -> two full contributions, rank 1 fused.
    assert rows[1]["rank_lex"] == 1 and rows[1]["rank_sem"] == 1
    assert rows[1]["rank"] == 1
    assert rows[1]["rrf_micro"] == 2 * round(1_000_000 / 61)
    # doc 3 never matched lexically; its lex rank is NULL but it still
    # fuses in from the semantic list.
    assert rows[3]["rank_lex"] is None and rows[3]["rank_sem"] is not None
    # every fused score is the sum of its two (coalesced) contributions.
    for r in out:
        expect = 0
        if r["rank_lex"] is not None:
            expect += round(1_000_000 / (60 + r["rank_lex"]))
        if r["rank_sem"] is not None:
            expect += round(1_000_000 / (60 + r["rank_sem"]))
        assert r["rrf_micro"] == expect


def test_bm25_topk_is_take_ordered(spark):
    # The global top-k must stay TakeOrderedAndProject (per-partition
    # heaps), never a global Sort of the aggregate — same plan_audit
    # posture as corpus_top_ngrams.
    docs = _docs(spark, [(i, "spark pad") for i in range(20)])
    plan = retrieval.bm25_topk(docs, ("spark",), k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_null_text_docs_are_inert(spark):
    # A NULL-text doc must not perturb N / sum_dl (size(split(NULL)) is
    # -1, not 0) nor appear in the ranking.
    with_null = _docs(
        spark, [(1, "spark spark scan"), (2, None), (3, "spark scan scan")]
    )
    without = _docs(spark, [(1, "spark spark scan"), (3, "spark scan scan")])
    a = {r.doc_id: r.bm25_micro for r in
         retrieval.bm25_topk(with_null, ("spark",), k=10).collect()}
    b = {r.doc_id: r.bm25_micro for r in
         retrieval.bm25_topk(without, ("spark",), k=10).collect()}
    assert a == b and 2 not in a
