"""As-of (time-travel) join — the classic timeseries operator Spark has
no native form of (DuckDB ships it as ``ASOF JOIN``, which is exactly
what the oracle uses to check this implementation).

For each left row, attach the right-side values from the LATEST right
row of the same key with ``right_ts <= left_ts`` (backward as-of,
inclusive — the standard state-at-event-time semantics).

Spark-first shape — the union/last-value trick, NOT a range join:

    union(left, right) → window per key ordered by (ts, side)
      → last(value, ignorenulls=True) over unbounded-preceding
      → keep left rows

One shuffle on the key, a per-key sort, zero candidate explosion.  A
naive ``l.ts >= r.ts`` range join produces O(|matches per key|²)
intermediate rows and degenerates to a per-key cross product at scale;
the window form is linear in the union size — this is the standard
distributed as-of (Flink's temporal join and pandas.merge_asof have the
same structure).

Right rows must be unique per (key, right_ts); pre-aggregate otherwise
(the ordering inside a tie would be nondeterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: Sequence[str] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join; left columns preserved, each ``right_values``
    column appears as ``{name}{suffix}`` (null when no prior right row).
    """
    out_cols = list(left.columns)
    l = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__src", F.lit(1)
    )
    # The right values ride inside ONE struct column: last(ignorenulls)
    # must skip left rows (which carry no state) but NOT a right row
    # whose value happens to be NULL — a struct is non-null for every
    # right row regardless of the values inside, so the latest matching
    # row wins even when it carries NULL (matching ASOF JOIN / merge_asof
    # semantics; per-column last(ignorenulls) would leak a stale older
    # value through the NULL).
    # NULL keys never match in SQL ASOF/equi-join semantics, but a window
    # PARTITION BY groups all NULL keys together — drop NULL-key right
    # rows so a NULL-key left row cannot inherit their state (it gets
    # NULL columns, the no-match result, like DuckDB ASOF JOIN).
    r = (
        right.where(F.col(key).isNotNull())
        .select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            F.struct(*[F.col(c) for c in right_values]).alias("__rstate"),
        )
        .withColumn("__src", F.lit(0))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at the same timestamp (__src asc),
    # so a state change at exactly the event time is visible — the
    # inclusive <= of ASOF JOIN.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    state = F.last("__rstate", ignorenulls=True).over(w)
    filled = unioned.select(
        *out_cols,
        F.col("__src"),
        *[state[c].alias(f"{c}{suffix}") for c in right_values],
    )
    return filled.where(F.col("__src") == 1).drop("__src")
