"""Bucketed-layout demonstration on the engine's own fact tables:
write lineitem + orders hash-bucketed by orderkey ONCE, then show the
repeated join+aggregate workload runs with ZERO exchanges vs the flat
parquet baseline's shuffles.

This is the 100 TB strategy made concrete: a fact table that co-joins on
the same key query after query should pay its shuffle at write time.
The demo prints exchange counts and wall-times for both layouts and
asserts the bucketed plan is exchange-free.

Usage: python scripts/bucketing_demo.py [sf_dir] [buckets]
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from k8stream_spark.io import bucketed as bk  # noqa: E402
from k8stream_spark.session import get_spark  # noqa: E402
from k8stream_spark.sources.fixtures import load_table  # noqa: E402


def run(df, label: str) -> tuple[float, int, int]:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    ex = len(re.findall(r"Exchange hashpartitioning", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    print(f"{label:28s} {dt:6.2f}s  exchanges={ex}  smj={smj}")
    return dt, ex, smj


def workload(lineitem, orders):
    """The repeated shape: fact-fact join on orderkey + per-order
    rollup — both requirements keyed on the bucket key."""
    j = lineitem.join(orders, "o_orderkey")
    return j.groupBy("o_orderkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("double")).alias("total_qty"),
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("bucketing-demo")
    # Force the shuffle-join path so the layout (not a broadcast) is
    # what eliminates work — at 100 TB neither fact side broadcasts.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    od = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority"
    )

    flat_t, flat_ex, _ = run(workload(li, od), "flat parquet")

    t0 = time.time()
    spark.sql("DROP TABLE IF EXISTS demo_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS demo_orders_b")
    bk.write_bucketed(li, "demo_lineitem_b", "o_orderkey", buckets)
    bk.write_bucketed(od, "demo_orders_b", "o_orderkey", buckets)
    print(f"{'bucketed write (once)':28s} {time.time() - t0:6.2f}s")

    bq = workload(
        spark.table("demo_lineitem_b"), spark.table("demo_orders_b")
    )
    b_t, b_ex, b_smj = run(bq, f"bucketed x{buckets}")
    assert b_ex == 0, "bucketed join must be exchange-free"
    assert b_smj >= 1, "co-located path is SortMergeJoin"
    assert flat_ex >= 1, "flat baseline should shuffle (else no story)"

    # results identical across layouts
    a = workload(li, od).orderBy("o_orderkey", "o_orderpriority")
    b = bq.orderBy("o_orderkey", "o_orderpriority")
    assert a.collect() == b.collect(), "layouts must agree"
    print("results identical; bucketed plan exchange-free")

    spark.sql("DROP TABLE demo_lineitem_b")
    spark.sql("DROP TABLE demo_orders_b")
    spark.stop()


if __name__ == "__main__":
    main()
