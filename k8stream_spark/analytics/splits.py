"""Deterministic dataset splitting and class-balanced downsampling —
the reproducibility layer of a training-data pipeline.

Both operators assign each row a stable bucket in [0, 100) derived from
``md5(seed:id)`` — a pure column expression (JVM-side, no RNG state), so
the same row lands in the same split on every run, every engine, and
every cluster size.  ``sample()``-style probabilistic splits are NOT
reproducible across partitionings; hash-bucketing is how production
pipelines pin train/val/test membership.  md5 is engine-portable (the
DuckDB oracle computes the identical buckets), and the first 8 hex chars
give 32 uniform bits — far more than the 100 buckets need.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(
    id_col: Column | str, seed: str = "split-v1", buckets: int = 100
) -> Column:
    """Stable bucket in [0, buckets): first 32 bits of md5(seed:id)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    tagged = F.concat(F.lit(seed), F.lit(":"), c.cast("string"))
    return (
        F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split-v1",
    weights: Sequence[int] = (90, 5, 5),
    names: Sequence[str] = ("train", "val", "test"),
) -> DataFrame:
    """Assign every row to a named split by hash bucket.  ``weights`` are
    integer percentages (cumulative ranges over the bucket space), so
    membership is exact and auditable, not probabilistic."""
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = sum(weights)
    bucket = hash_bucket(id_col, seed, total)
    expr = None
    cum = 0
    for w, name in zip(weights, names):
        cum += w
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("bucket", bucket).withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    class_col: str,
    rates: Mapping[str, int],
    id_col: str = "doc_id",
    seed: str = "sample-v1",
    default_rate: int = 100,
) -> DataFrame:
    """Deterministic per-class downsampling: keep a row iff its hash
    bucket < the class's percentage rate.  The class-imbalance fix for
    training corpora (keep all rare positives, thin the dominant class),
    reproducible run-over-run because membership is a pure function of
    (seed, id).  One filter expression — no shuffle, no RNG."""
    bucket = hash_bucket(id_col, seed, 100)
    rate = None
    for cls, r in sorted(rates.items()):
        cond = F.col(class_col) == cls
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = F.lit(default_rate) if rate is None else rate.otherwise(default_rate)
    return df.where(bucket < rate)


def pack_chunks(
    df,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    capacity: int = 2048,
    seed: str = "pack-v1",
):
    """Sequence-packing accounting (the concat-and-chunk strategy LLM
    training pipelines use): documents are laid out in a deterministic
    hash-shuffled order, token counts accumulate, and the stream is cut
    into fixed ``capacity``-token context windows.  Returns, per doc,
    its position and the [start_chunk, end_chunk] window range it lands
    in (a doc longer than the remaining window spans several).

    Deterministic by construction: the order is md5(seed:id) (engine-
    portable — the oracle reproduces it exactly), and chunk indices are
    pure prefix-sum arithmetic, so the layout is reproducible run over
    run — the property that makes training resumable.  One global
    window over the hash order; at 100 TB the same math shards by
    ``bucket`` first (hash-split the corpus, pack per shard in
    parallel) — the per-shard form is this function applied per group.
    """
    order_key = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    w = Window.orderBy(order_key.asc(), F.col(id_col).asc())
    cum = F.sum(F.col(n_tokens_col)).over(w)
    return df.select(
        F.col(id_col),
        F.col(n_tokens_col),
        F.row_number().over(w).cast("bigint").alias("pack_pos"),
        F.floor((cum - F.col(n_tokens_col)) / capacity)
        .cast("bigint")
        .alias("start_chunk"),
        F.floor((cum - 1) / capacity).cast("bigint").alias("end_chunk"),
    )
