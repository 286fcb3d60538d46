"""Skew resilience on the hot-bucket candidate paths (dedup + ANN).

At 100 TB a single hot LSH bucket or semantic cell is real data skew:
one join key carries a disproportionate share of the rows, so the
candidate equi-join's shuffle partition for that key dwarfs the rest.
Three layers of defense are asserted here:

* AQE's skew-join split ENGAGES on the hot-key shuffle-join shape the
  candidate joins reduce to (the executed plan reports ``skew=true``,
  thresholds scaled to fixture bytes — at cluster scale the default
  256 MB threshold plays the same role);
* the real operators (``minhash_lsh_pairs``, ``semantic_dedup``) stay
  EXACT on a fixture with ~20% of rows in one bucket/cell — skew
  degrades parallelism, never correctness;
* wall time stays bounded (generous CI bound — the point is "finishes
  normally", not a benchmark).

The in-bucket candidate volume is quadratic by design (SCALE.md audits
it); banding parameters bound the bucket population, AQE bounds the
per-task bytes.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from k8stream_spark.analytics import dedup, similarity


@contextmanager
def _confs(spark, **kv):
    """Set session confs for one test, restoring previous values after."""
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_aqe_skew_split_engages_on_hot_bucket_join(spark):
    """The candidate joins reduce to a self-equi-join on a bucket key.
    With one key holding a third of the rows, AQE must split the hot
    shuffle partition: the final adaptive plan reports a skew=true
    join.  Three lessons this test encodes (each found the hard way):

    * shuffle statistics are COMPRESSED block sizes, so the payload must
      be incompressible (md5 hex, not a repeated character) to cross a
      bytes threshold;
    * the two sides must not be the same frame, or exchange reuse
      (ReusedExchange) gives the splitter only one stage to work with;
    * the skewed partition must dominate the MEDIAN partition — with
      few shuffle partitions every partition carries ~n/partitions rows
      and the hot key disappears into the noise (32 partitions here,
      runtime coalescing off so the medians stay small).
    """
    n, hot = 24000, 8000

    def side(tag):
        h = F.md5(F.concat(F.lit(tag), F.col("id").cast("string")))
        return spark.range(n).select(
            F.when(F.col("id") < hot, F.lit(0))
            .otherwise(F.col("id"))
            .alias("bucket"),
            F.concat(h, h, h, h, h, h).alias("payload" + tag),
        )

    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "32768",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            # the global count's single-partition exchange would veto
            # the split under the no-extra-shuffle rule; at scale the
            # downstream exchange exists anyway
            "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        },
    ):
        # Aggregate over BOTH payloads so column pruning can't shrink
        # the shuffled rows below the skew threshold — the hot partition
        # must actually carry its bytes.
        joined = side("p").join(side("q"), "bucket").select(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.length("payloadp") + F.length("payloadq")).alias(
                "bytes"
            ),
        )
        [out] = joined.collect()
        # hot key pairs + identity matches for the unique keys
        assert out.n_pairs == hot * hot + (n - hot)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]


def _skewed_docs(spark, n=1200, hot=240):
    """~20% of docs share ONE text → identical shingles → one hot LSH
    bucket in every band; the rest have disjoint token sets."""
    hot_text = " ".join(f"dup{i}" for i in range(30))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < hot, F.lit(hot_text))
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"u{j}x"), F.col("id").cast("string"))
                    for j in range(8)
                ],
            )
        )
        .alias("text"),
    )


def test_minhash_lsh_exact_under_hot_bucket(spark):
    """One bucket at 20% of the corpus: the verified output must still
    be exactly the hot group's all-pairs set, in bounded time, with the
    shuffle-join path forced (no broadcast escape hatch)."""
    n, hot = 1200, 240
    docs = _skewed_docs(spark, n, hot)
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "65536",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        },
    ):
        t0 = time.time()
        pairs = dedup.minhash_lsh_pairs(docs).collect()
        elapsed = time.time() - t0
    assert len(pairs) == hot * (hot - 1) // 2
    assert all(p.jaccard == 1.0 for p in pairs)
    assert all(p.doc_a < hot and p.doc_b < hot for p in pairs)
    assert elapsed < 120, f"hot-bucket LSH took {elapsed:.1f}s"


def test_semantic_dedup_exact_under_hot_cell(spark):
    """One semantic cell at ~20% of vectors (identical embeddings →
    same cell, all dups of the lowest id): coverage, within-cell
    completeness and pointer totality must all hold, in bounded time."""
    import numpy as np

    rng_dim = 16
    n, hot = 1000, 200
    base = []
    for i in range(n):
        if i < hot:
            v = [1.0] + [0.0] * (rng_dim - 1)
        else:
            # deterministic spread, far from the hot direction and from
            # each other (distinct random-ish unit vectors)
            raw = np.array(
                [((i * 31 + d * 17) % 97) - 48 for d in range(rng_dim)],
                dtype=float,
            )
            raw[0] = -abs(raw[0])  # keep away from the hot axis
            v = (raw / np.linalg.norm(raw)).tolist()
        base.append((i, v))
    emb = spark.createDataFrame(
        base, "vec_id bigint, embedding array<double>"
    )
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "65536",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        },
    ):
        t0 = time.time()
        out = {
            r.vec_id: r
            for r in similarity.semantic_dedup(
                emb, threshold=0.95, dim=rng_dim
            ).collect()
        }
        elapsed = time.time() - t0
    assert len(out) == n  # coverage
    # the hot group: one survivor (the smallest id), rest removed with
    # dup_of pointing at a lower hot id
    assert out[0].kept
    for i in range(1, hot):
        assert not out[i].kept and out[i].dup_of is not None
        assert out[i].dup_of < i
    assert elapsed < 120, f"hot-cell semantic dedup took {elapsed:.1f}s"
