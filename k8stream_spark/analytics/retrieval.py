"""Retrieval operators for the RAG / data-curation layer: BM25 lexical
top-k over the ``documents`` table and hybrid lexical+semantic fusion
(reciprocal-rank fusion) with the embedding ANN layer.

These are the query-side complement to the dedup/quality operators: a
training-data pipeline that builds RAG corpora needs the same engine to
*retrieve* from them (mine hard negatives, audit near-duplicate answers,
build eval sets), and retrieval is where lexical and vector scoring have
to compose.

Engine-exactness conventions (shared with the rest of the repo):

* **Log-free rational idf.**  Classic BM25 idf is ``ln((N-df+0.5)/
  (df+0.5) + 1)``; transcendentals are the one place IEEE-754 does NOT
  pin cross-engine results (libm vs Java Math differ in final ulps), so
  this variant scores with the rational ``(N-df+0.5)/(df+0.5)`` directly.
  ``ln`` is monotone, so the PER-TERM ordering is identical; the summed
  score is a documented variant (weights rare terms more steeply), and
  every arithmetic op in it — add/sub/mul/div on binary64 — is correctly
  rounded per IEEE-754 and therefore bit-identical on Spark and DuckDB
  given the same expression tree (the oracle strings repeat the tree
  verbatim, parenthesis for parenthesis).
* **Integer micro-unit sums.**  Per-term scores are rounded to micro
  units (×1e6 → BIGINT) *before* the per-document sum, so the aggregate
  is exact integer arithmetic — float sums are summation-order-dependent
  and a hash-matching oracle cannot tolerate them (same device as the
  class-centroid encoding, similarity.py).
* **BM25 constants chosen binary-exact**: k1 = 2 and b = 0.75 (= 3/4)
  are exactly representable, so ``1 - b``, ``b * x`` and ``k1 * x``
  introduce no constant-encoding drift (the textbook k1 = 1.2 is not
  representable in binary64).

Scale shape (the 100 TB posture): the only corpus-sized work is one
token explode filtered to the query's terms BEFORE the shuffle (the
``isin`` predicate prunes ~|V|/|q| of the exploded rows at the scan),
one (doc, term) count shuffle, and broadcast joins for the per-term df
and the two global scalars (N, Σdl).  The final top-k is
TakeOrderedAndProject — per-partition heaps, never a global sort.  RRF
fusion only ever touches the two constant-size top-n lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from k8stream_spark.analytics.similarity import cosine_topk
from k8stream_spark.analytics.text import tokens

# Fixed retrieval query for the registry entries — pinned so the DuckDB
# oracle can repeat it, drawn from the synthetic corpus vocabulary.
QUERY_TERMS: tuple[str, ...] = ("spark", "join", "vector", "hash")

# Micro-unit scale for engine-portable integer score sums.
_MICRO = 1000000.0


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...] = QUERY_TERMS,
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under rational-idf BM25
    (k1=2, b=0.75; see module docstring for why both the idf variant and
    the constants are engine-exact).

    Returns (doc_id, n_hit_terms, bm25_micro, rank): ``bm25_micro`` is
    the BM25 score in integer micro-units (Σ over query terms of
    round(idf·tf_norm·1e6)), rank dense from 1, ties broken by doc_id.

    Per-term score, written with the exact association the oracle
    repeats::

        idf  = (N - df + 0.5) / (df + 0.5)
        norm = 0.25 + (0.75 * ((dl * N) / Σdl))        # 1-b+b·dl/avgdl
        s    = idf * ((tf * 3.0) / (tf + (2.0 * norm)))  # tf·(k1+1)/(tf+k1·norm)

    Shuffles: one (doc_id, token) count over the isin-pruned explode,
    one doc_id re-agg of micro scores; df / N / Σdl ride broadcast
    joins.  The candidate set is only documents containing ≥1 query
    term — at 100 TB the explode filter is the whole game, and it is
    applied before any exchange.
    """
    toks = tokens(text_col)
    # Doc lengths in the SAME pass that feeds the explode: dl counts ALL
    # tokens (BM25 length normalization), while the exploded stream is
    # pruned to query terms immediately.  NULL-text docs are excluded up
    # front: they can never match, and size(split(NULL)) is -1 (not 0),
    # which would silently poison N and Σdl.
    base = df.where(F.col(text_col).isNotNull()).select(
        "doc_id", toks.alias("__tk")
    )
    dl = base.select(
        "doc_id", F.size(F.col("__tk")).cast("bigint").alias("dl")
    )
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    # hits feeds TWO consumers (per-term df and the scoring join); without
    # persist each branch re-runs the corpus explode + count shuffle (the
    # executed plan showed two identical (doc_id, token) exchanges).
    # Materialized eagerly — the frame is candidate-docs × |q| id/count
    # rows, tiny next to the corpus (same persist-before-reuse pattern as
    # the minhash signatures).
    hits = (
        base.select("doc_id", F.explode(F.col("__tk")).alias("token"))
        .where(F.col("token").isin(*query_terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    ).persist()
    hits.count()
    dfreq = hits.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        hits.join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .join(F.broadcast(dfreq), "token")
    )
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    norm = F.lit(0.25) + (
        F.lit(0.75)
        * (
            (F.col("dl").cast("double") * F.col("n_docs"))
            / F.col("sum_dl")
        )
    )
    s = idf * (
        (F.col("tf") * F.lit(3.0)) / (F.col("tf") + (F.lit(2.0) * norm))
    )
    micro = F.round(s * F.lit(_MICRO), 0).cast("bigint")
    agg = (
        scored.select("doc_id", micro.alias("__m"))
        .groupBy("doc_id")
        .agg(
            F.sum("__m").alias("bm25_micro"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
    )
    top = agg.orderBy(F.col("bm25_micro").desc(), F.col("doc_id")).limit(k)
    # Rank over the k-row top slice only (constant-size; the global
    # ordering work already happened inside TakeOrderedAndProject).
    w = Window.orderBy(F.col("bm25_micro").desc(), F.col("doc_id"))
    return top.select(
        "doc_id",
        F.col("n_hit_terms").cast("bigint").alias("n_hit_terms"),
        "bm25_micro",
    ).withColumn("rank", F.row_number().over(w).cast("bigint"))


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: tuple[str, ...] = QUERY_TERMS,
    query_vec_id: int = 0,
    k: int = 10,
    n: int = 50,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al., SIGIR'09)
    of the BM25 lexical ranking and the exact-cosine semantic ranking,
    joined on doc_id == vec_id (the synthetic corpus aligns them).

    Each list contributes ``round(1e6 / (rrf_k + rank))`` integer micro
    units; a document absent from a list contributes 0 from it.  The
    division is one correctly-rounded binary64 op, the sum is two-term
    integer addition — engine-exact end to end, no float aggregation.

    Returns the fused top-k: (doc_id, rank_lex, rank_sem, rrf_micro,
    rank).  Scale: both inputs are top-n lists (constant size n, not
    data-sized) — the corpus-scale work lives inside ``bm25_topk`` and
    ``cosine_topk``; everything here is O(n).
    """
    lex = bm25_topk(docs, query_terms, k=n).select(
        "doc_id", F.col("rank").alias("rank_lex")
    )
    sem = cosine_topk(embeddings, (query_vec_id,), k=n).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("rank_sem"),
    )
    contrib = lambda r: F.round(  # noqa: E731
        F.lit(_MICRO) / (F.lit(float(rrf_k)) + r), 0
    ).cast("bigint")
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_sem",
        (
            F.coalesce(contrib(F.col("rank_lex")), F.lit(0))
            + F.coalesce(contrib(F.col("rank_sem")), F.lit(0))
        ).alias("rrf_micro"),
    )
    top = fused.orderBy(F.col("rrf_micro").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))
