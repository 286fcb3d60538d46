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

from pyspark.sql import Column, DataFrame
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
