"""Event-stream analytics over the driver ``events`` table — the queries a
consumer of the reference's NDJSON output would run (reference
README.md:73-81 defers ordering/dedup/analytics to the consumer), plus the
JSON prop extraction the reference does with encoding/json (F7,
reference cache.go:81, flush.go:44).

All expressions — `get_json_object` is a codegen'd JVM path, not a UDF.
Window/sessionize shuffle once on user_id (per-key sorts only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from k8stream_spark.analytics.tpch import exact_sum


def _epoch_long(col: str) -> Column:
    """Epoch seconds (truncated) from a timestamp/timestamp_ntz column —
    NTZ is cast through TIMESTAMP under the pinned-UTC session so the
    value matches DuckDB's floor(epoch(ts))."""
    return F.col(col).cast("timestamp").cast("long")


def extract_props(df: DataFrame, prop: str = "k") -> DataFrame:
    """F7 — JSON property extraction from the ``props`` string column."""
    return df.select(
        "event_id",
        "event_type",
        F.get_json_object("props", f"$.{prop}").cast("bigint").alias(prop),
    )


def hourly_type_counts(df: DataFrame) -> DataFrame:
    """Tumbling hourly counts per event type (event-time aggregation)."""
    return df.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value")).alias("total_value"),
    )


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: a new session starts after ``gap_minutes`` of user
    inactivity.  lag + running sum over a per-user window — the batch
    equivalent of ``session_window``.

    All ordering/gap math runs on truncated epoch *seconds* (with
    event_id tiebreak) so the session assignment is deterministic and
    identical in any engine regardless of sub-second precision.
    """
    tsec = _epoch_long("ts")
    base = df.select("user_id", "event_id", tsec.alias("tsec"))
    w = Window.partitionBy("user_id").orderBy("tsec", "event_id")
    prev = F.lag("tsec").over(w)
    new_session = F.when(
        prev.isNull() | (F.col("tsec") - prev > gap_minutes * 60), 1
    ).otherwise(0)
    with_sess = base.withColumn(
        "session_id", F.sum(new_session).over(w).cast("bigint")
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        (F.max("tsec") - F.min("tsec")).alias("duration_s"),
    )


def session_window_agg(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via the NATIVE ``session_window`` operator (the same
    one the streaming layer uses with a watermark) — vs ``sessionize``,
    which builds sessions from window functions.  Boundary semantics
    pinned (and locked by a pytest): an event exactly ``gap`` after its
    predecessor JOINS the session — windows merge when next start <=
    previous end; ``window.end`` is last event time + gap."""
    return (
        df.groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def value_quantiles(df: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of ``value`` per event type.  Spark's
    ``percentile`` matches DuckDB's ``quantile_cont`` bit-for-bit on
    doubles; the approximate-at-scale alternative is
    ``percentile_approx`` (t-digest), swapped in when exactness is not
    oracle-checked."""
    return df.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.count(F.lit(1)).alias("n_events"),
    )


def value_quantiles_sketch(
    df: DataFrame, bin_width: float = 0.01
) -> DataFrame:
    """Bin-sketch percentiles of ``value`` per event type — the 100 TB
    twin of ``value_quantiles``: exact ``percentile`` gathers every
    group's values into one aggregation buffer (state = O(group size)),
    while the equi-width histogram carries ONE counter per occupied bin
    (state = value-range / bin_width, fixed however big the data), the
    same bounded-state argument as the CMS and HLL sketches.  The
    estimate is the NEAREST-RANK quantile (the ceil(q·n)-th order
    statistic) to within one ``bin_width`` by construction — vs the
    INTERPOLATED quantile of ``value_quantiles`` it can additionally
    differ by the local data gap, which is a property of sparse data,
    not of the sketch.

    Deterministic and oracle-replayable end to end: bin =
    floor(value / bin_width) (one IEEE division + floor both engines
    repeat), per-(type, bin) counts, a per-type cumulative sum ordered
    by bin, and the q-quantile = the lowest bin whose running count
    reaches ceil(q·n) — every boundary decision is an int64 compare.

    Output per type: (event_type, n_events, p50_bin, p50_est, p95_bin,
    p95_est) with est = the bin's lower edge (bin · bin_width, rounded
    4 dp).

    Scale: one (type, bin)-keyed shuffle with map-side combine, then a
    per-type window over the BIN TABLE (≤ range/width rows per type,
    never the data), then a per-type min — all post-aggregation sizes.
    """
    b = F.floor(F.col("value").cast("double") / F.lit(float(bin_width)))
    counts = (
        df.where(F.col("value").isNotNull())
        .groupBy("event_type", b.cast("bigint").alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("event_type")
    run = counts.select(
        "event_type",
        "__b",
        F.sum("__c").over(w).alias("__run"),
        F.sum("__c").over(tot).alias("n_events"),
    )
    est = lambda col: F.round(  # noqa: E731
        col * F.lit(float(bin_width)), 4
    )
    qbin = lambda q: F.min(  # noqa: E731
        F.when(
            F.col("__run") >= F.ceil(F.lit(q) * F.col("n_events")), F.col("__b")
        )
    )
    return run.groupBy("event_type").agg(
        F.max("n_events").alias("n_events"),
        qbin(0.5).alias("p50_bin"),
        est(qbin(0.5)).alias("p50_est"),
        qbin(0.95).alias("p95_bin"),
        est(qbin(0.95)).alias("p95_est"),
    )


def approx_user_counts(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Distinct users per event type via HyperLogLog++
    (``approx_count_distinct``) next to the exact count — the sketch the
    100 TB path uses (one pass, bounded memory) with the exact value as
    its in-query accuracy witness.  Sketch estimates are
    implementation-defined, so this is a rows-only query; pytest bounds
    the relative error."""
    return df.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def approx_distinct_bound(
    df: DataFrame, rsd: float = 0.05, factor: float = 3.0
) -> DataFrame:
    """Hash-checkable accuracy witness for ``approx_user_counts``: per
    event type, the exact distinct count plus an integer flag that the
    HLL++ estimate landed within ``factor × rsd`` relative error (floor
    of one absolute count, so tiny groups don't flap).

    HLL++ is deterministic — same input, same registers, same estimate —
    so the flag is a stable bit, not a flaky tolerance: the oracle
    asserts the bound HOLDS (``within_bound = true`` for every group),
    turning the engine-specific estimate into a graded integer contract.
    The estimate itself stays visible (rows-only) in
    ``approx_user_counts``; this is its driver-checkable shadow."""
    bound = F.greatest(
        F.ceil(F.lit(factor * rsd) * F.col("exact_users")), F.lit(1)
    )
    return (
        approx_user_counts(df, rsd)
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users")) <= bound
            ).alias("within_bound"),
        )
    )


#: Register-count exponent for the replayable HLL: m = 2^9 = 512
#: registers → rsd ≈ 1.04/√512 ≈ 4.6 %.  The 60-bit sha256 hash splits
#: into 9 index bits + 51 rank bits, so every quantity below stays an
#: exact int64: per-register term 2^(52−rank) ≤ 2^51, register sum
#: ≤ 512·2^52 = 2^61 < 2^63.
_HLL_B = 9
_HLL_M = 1 << _HLL_B
#: α_m·m²·2^52 precomputed as ONE double literal (repr-exact in both
#: engines), so the raw estimate is a single division of exact parts.
_HLL_NUMER = 0.7213 / (1.0 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * float(1 << 52)


def hll_user_counts(df: DataFrame, factor: float = 3.0) -> DataFrame:
    """Distinct users per event type via a REPLAYABLE HyperLogLog
    (Flajolet et al. 2007) — the hash-checked successor to the
    rows-only ``approx_user_counts``: instead of Spark's HLL++ sketch
    (engine-specific registers), the sketch is built from first
    principles with engine-portable ops, so the DuckDB oracle replays
    register construction, the harmonic-mean estimate and the
    linear-counting correction bit-for-bit and the ESTIMATE ITSELF is
    graded, not just an error bound.

    Construction (every step integer-exact or a single IEEE op both
    engines repeat):

    * h = first 15 sha256 hex digits of str(user_id) → 60-bit int64;
    * register index = h & (m−1); rank = 52 − bitlength(h >> 9)
      (bitlength via the base-2 string, no float log2 — floor(log2(x))
      rounds WRONG at 2^k−1 for large k);
    * per register M = max(rank); registers sum S = Σ 2^(52−M) as exact
      int64 (absent registers contribute 2^52 each);
    * raw estimate = α_m·m²·2^52 / S (one double division of exact
      parts); linear counting m·ln(m/V) when raw ≤ 2.5 m and V > 0
      empty registers remain — the only transcendental in the pipeline,
      and the final round() is ~1e-10 away from any boundary.

    Output: (event_type, exact_users, hll_users, within_bound) with the
    exact distinct count as in-query accuracy witness and
    ``within_bound`` = |estimate − exact| ≤ max(1, ⌈factor·rsd·exact⌉).

    Scale: the register build is one (type, register)-keyed groupBy —
    map-side combined, ≤ m rows per type survive the shuffle — plus the
    exact countDistinct witness (itself two-stage).  At 100 TB the
    witness is the expensive half; drop it and the sketch alone is one
    bounded-state pass, the HLL contract.
    """
    m = _HLL_M
    rsd = 1.04 / (m ** 0.5)
    h = F.conv(
        F.substring(F.sha2(F.col("user_id").cast("string"), 256), 1, 15),
        16,
        10,
    ).cast("bigint")
    rem = F.shiftright(F.col("__h"), _HLL_B)
    rank = F.when(rem == 0, F.lit(52)).otherwise(
        F.lit(52) - F.length(F.conv(rem.cast("string"), 10, 2))
    )
    regs = (
        df.where(F.col("user_id").isNotNull())
        .select(
            "event_type",
            h.alias("__h"),
        )
        .select(
            "event_type",
            F.col("__h").bitwiseAND(F.lit(m - 1)).alias("__idx"),
            rank.alias("__rank"),
        )
        .groupBy("event_type", "__idx")
        .agg(F.max("__rank").alias("__M"))
    )
    # PySpark's F.shiftleft only takes a literal bit count — the SQL
    # form accepts a column expression.
    sketch = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 52 - __M)"))
        .cast("bigint")
        .alias("__s_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    v = F.lit(m) - F.col("__n_present")
    s_total = F.col("__s_present") + v * F.shiftleft(
        F.lit(1).cast("bigint"), 52
    )
    e_raw = F.lit(_HLL_NUMER) / s_total.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    exact = df.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    bound = F.greatest(
        F.ceil(F.lit(factor * rsd) * F.col("exact_users")), F.lit(1)
    )
    return (
        sketch.withColumn("hll_users", F.round(est).cast("bigint"))
        .join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            "hll_users",
            (
                F.abs(F.col("hll_users") - F.col("exact_users")) <= bound
            ).alias("within_bound"),
        )
    )


def user_type_matrix(df: DataFrame) -> DataFrame:
    """Per-user event-type pivot counts (fixed pivot values → single pass,
    no second job to discover distinct values)."""
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        df.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def rolling_user_stats(df: DataFrame, window_rows: int = 10) -> DataFrame:
    """Per-user rolling sum/max of ``value`` over the previous
    ``window_rows`` events (inclusive), ordered by time — the
    feature-engineering window shape (trailing aggregates per entity).

    One shuffle on user_id, per-key sort, bounded ROWS frame — no
    growing state, no self-join; identical frame semantics in ANSI SQL,
    so the oracle runs the same window verbatim.  event_id breaks
    same-timestamp ordering ties deterministically.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-(window_rows - 1), 0)
    )
    # Sum in exact decimal (the 2-dp values are not binary-exact; a
    # sliding double accumulator can disagree with a recomputing one in
    # the last bits) — same discipline as tpch.exact_sum.
    rolling_sum = (
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
    )
    return df.select(
        "event_id",
        "user_id",
        "ts",
        rolling_sum.alias("rolling_sum"),
        F.max("value").over(w).alias("rolling_max"),
        F.count(F.lit(1)).over(w).alias("rolling_n"),
    )


def funnel_counts(
    df: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered funnel: how many users reached each stage IN ORDER — a
    user counts for stage k iff their first occurrence of every earlier
    stage happened at or before their first occurrence of stage k.

    One shuffle (groupBy user_id with conditional min-ts per stage —
    partial agg map-side), then the ordering test is a pure expression
    and the final count is a tiny global aggregate.  Output: one row per
    stage with the user count, deterministic integers.
    """
    mins = df.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(
                f"__t{i}"
            )
            for i, s in enumerate(stages)
        ]
    )
    reached = []
    for i, s in enumerate(stages):
        cond = F.col("__t0").isNotNull()
        for j in range(1, i + 1):
            cond = cond & (
                F.col(f"__t{j}").isNotNull()
                & (F.col(f"__t{j-1}") <= F.col(f"__t{j}"))
            )
        # count(when(...)) — never NULL on empty input, matching the
        # oracle's COUNT FILTER (a sum of casts would be NULL over 0 rows)
        reached.append(F.count(F.when(cond, 1)).alias(f"__n{i}"))
    agg = mins.agg(*reached)
    # stack() unpivots the single aggregate row into one row per stage —
    # fully declarative, no driver-side collect.  Stage names are spliced
    # into an expression string, so quotes must be escaped.
    def _lit(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    parts = ", ".join(
        f"CAST({i} AS BIGINT), '{_lit(s)}', __n{i}"
        for i, s in enumerate(stages)
    )
    return agg.select(
        F.expr(
            f"stack({len(stages)}, {parts}) AS (stage_idx, stage, n_users)"
        )
    )


def retention_cohorts(df: DataFrame) -> DataFrame:
    """Weekly cohort-retention matrix — the canonical product-analytics
    rollup: users are grouped by the week of their FIRST event (cohort),
    and each (cohort_week, week_offset) cell counts how many of them came
    back ``offset`` weeks later, plus the event volume they produced.

    Weeks are integer day-epochs floor-divided by 7 anchored at Monday
    1970-01-05 — a pure integer expression every engine computes
    identically (no date_trunc('week') dialect drift, no timezone).

    Scale shape: ONE scan and one data-sized shuffle — the event stream
    reduces immediately to (user, week) counts (map-side partial agg),
    the cohort comes from a user-partitioned window MIN over that
    already-reduced frame, and the final rollup groups the same frame on
    the tiny (cohort, offset) key.  n_users needs no countDistinct: the
    (user, week) grain makes every row one distinct user.  (The obvious
    first-seen-join formulation scans the events twice and shuffles the
    full stream for the join; this shape never touches raw events after
    the first aggregate.)
    """
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-05").cast("date"))
        / F.lit(7)
    ).cast("bigint")
    wk = (
        df.select("user_id", week.alias("__w"))
        .groupBy("user_id", "__w")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    cohort = F.min("__w").over(Window.partitionBy("user_id"))
    return (
        wk.withColumn("__cohort", cohort)
        .groupBy(
            F.col("__cohort").alias("cohort_week"),
            (F.col("__w") - F.col("__cohort")).alias("week_offset"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("__n").alias("n_events"),
        )
    )


def window_range_counts(
    df: DataFrame,
    n_windows: int = 12,
    stride_s: int = 7200,
    len_s: int = 3600,
    bin_s: int = 3600,
) -> DataFrame:
    """Per-window event/user counts for time-range containment (campaign
    windows, maintenance windows, incident intervals): every event whose
    timestamp falls inside window i = [t0 + i·stride, t0 + i·stride +
    len) is counted toward it, where t0 is the corpus min timestamp.

    This is the engine's RANGE JOIN pattern.  Spark plans a pure
    ``ts BETWEEN start AND end`` theta join as BroadcastNestedLoopJoin —
    every event row tested against every window, O(events × windows),
    which dies when windows stop being tiny.  The scale-safe composition
    is time-binning: events get ``bin = tsec div bin_s`` in the scan
    projection, windows explode to the bins they overlap (⌈len/bin⌉ ≈ a
    couple of rows per window), the join is a plain EQUI-join on bin,
    and the exact range predicate runs as a residual filter on the
    equi-matched sliver.  O(events + windows·len/bin + matches), no
    nested loop, works shuffled OR broadcast — the same trick that
    scales interval joins in Flink/Trino and spatial grids everywhere.

    Windows with zero events stay in the output (left join back onto the
    window table, counts coalesced to 0) — silent window loss is the
    classic bug in incident accounting.  Bins never appear in the
    output, so bin arithmetic only needs self-consistency, not oracle
    replication; the DuckDB oracle runs the literal range join.
    """
    tsec = _epoch_long("ts")
    ev = df.select("user_id", tsec.alias("tsec"))
    t0 = ev.agg(F.min("tsec").alias("t0"))
    wins = (
        t0.select(
            F.explode(
                F.sequence(F.lit(0), F.lit(n_windows - 1))
            ).alias("window_id"),
            "t0",
        )
        .select(
            F.col("window_id").cast("bigint").alias("window_id"),
            (F.col("t0") + F.col("window_id") * stride_s).alias("start_s"),
            (F.col("t0") + F.col("window_id") * stride_s + len_s).alias(
                "end_s"
            ),
        )
    )
    wbins = wins.select(
        "window_id",
        "start_s",
        "end_s",
        F.explode(
            F.sequence(
                F.floor(F.col("start_s") / bin_s).cast("long"),
                F.floor((F.col("end_s") - 1) / bin_s).cast("long"),
            )
        ).alias("bin"),
    )
    ebins = ev.withColumn(
        "bin", F.floor(F.col("tsec") / bin_s).cast("long")
    )
    matched = (
        ebins.join(F.broadcast(wbins), "bin")
        .where(
            (F.col("tsec") >= F.col("start_s"))
            & (F.col("tsec") < F.col("end_s"))
        )
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.countDistinct("user_id").alias("__u"),
        )
    )
    return (
        wins.join(matched, "window_id", "left")
        .select(
            "window_id",
            "start_s",
            "end_s",
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias(
                "n_events"
            ),
            F.coalesce(F.col("__u"), F.lit(0)).cast("bigint").alias(
                "n_users"
            ),
        )
    )


def salted_distinct_counts(
    df: DataFrame,
    key_col: str = "event_type",
    target_col: str = "user_id",
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-key distinct counts with salt-partitioned aggregation —
    the skew device for the one hot-key shape AQE cannot fix.

    AQE's skew handling splits oversized SHUFFLE JOIN partitions; a
    skewed ``groupBy(key).agg(countDistinct(target))`` still funnels a
    hot key's entire distinct set through one reducer (the distinct
    expansion happens inside the aggregate, invisible to AQE).  The
    classic fix: salt by ``hash(target) mod n_salts`` — because the salt
    is a pure function of the TARGET value, each distinct target lands
    in exactly one (key, salt) cell, so per-cell distinct counts SUM to
    the exact per-key answer (no overlap, no loss).  The hot key's work
    spreads across ``n_salts`` reducers; phase 2 merges n_salts tiny
    rows per key.  Exactness dies if you salt by anything not a function
    of the target (e.g. a random salt double-counts duplicates that land
    in different cells).

    Two shuffles — (key, salt) then key — both carrying count rows; the
    phase-2 frame is keys × n_salts rows, trivially small.  Output:
    (key, n_distinct, n_events), identical to the unsalted aggregate.
    """
    salt = F.pmod(F.xxhash64(F.col(target_col)), F.lit(n_salts))
    phase1 = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(target_col).alias("__t"),
            salt.alias("__s"),
        )
        .groupBy("key", "__s")
        .agg(
            F.countDistinct("__t").alias("__d"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return (
        phase1.groupBy("key")
        .agg(
            F.sum("__d").cast("bigint").alias("n_distinct"),
            F.sum("__n").cast("bigint").alias("n_events"),
        )
        .select(F.col("key").alias(key_col), "n_distinct", "n_events")
    )


def anomaly_zscore(
    df: DataFrame,
    value_col: str = "value",
    by: str = "event_type",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier flags — the classic monitoring
    primitive over an event stream (the reference's own observability
    domain: "is this event's value wildly off for its type").  Per
    event: z in integer micro units and ``is_anomaly`` = |z| exceeds
    the threshold.

    Same exactness discipline as ``similarity.standardize``: per-group
    m and E[x²] are DECIMAL(28,12) sums rounded to 6 dp once (no
    float-summation-order dependence), then s = sqrt(m2 − m²), the z
    division and the threshold compare are single correctly-rounded
    IEEE ops.  Zero-variance groups flag nothing and z pins to 0; the
    guard tests the VARIANCE (m2 − m²) > 0, never sqrt's result —
    because m and m2 are rounded independently the difference can be
    slightly negative for constant groups (e.g. value 1.4999996),
    sqrt would give NaN, and Spark evaluates NaN > 0 as TRUE, turning
    the bigint cast of round(1e6·NaN) into CAST_OVERFLOW.

    Scale: one shuffle keyed by the (low-cardinality) group for the
    stats, broadcast join back, zero data-sized exchanges — the stats
    frame is |groups| rows.

    Denominator contract (pinned by
    ``tests/test_stateful.py::test_anomaly_batch_stream_null_symmetry``):
    n counts NON-NULL values — ``F.count(x)``, matching the null
    dropping in ``streaming.stateful.anomaly_stats_stateful`` — so the
    batch fold over any stream prefix equals the streaming state
    bit-for-bit even when the value column carries nulls.  (Before r10
    this was count(1)-over-rows with a null-skipping sum, a mean biased
    low by the null count; the streaming form is the statistically
    coherent one, so batch moved.)  Null-valued rows still emit an
    output row with NULL z_micro / is_anomaly — unscoreable, not
    silently dropped.
    """
    x = F.col(value_col).cast("double")
    stats = df.groupBy(by).agg(
        F.round(
            F.sum(x.cast("decimal(28,12)")).cast("double")
            / F.count(x),
            6,
        ).alias("__m"),
        F.round(
            F.sum((x * x).cast("decimal(28,12)")).cast("double")
            / F.count(x),
            6,
        ).alias("__m2"),
    )
    var = F.col("__m2") - F.col("__m") * F.col("__m")
    # Null values short-circuit BEFORE the variance guard: in the
    # var>0 branch (x-m)/s already propagates NULL, but the
    # otherwise(0.0) arm would score a null row in a zero-variance
    # group as z=0 / not-anomalous — a definite verdict on an
    # unscoreable row, contradicting the NULL-emission contract above.
    z = (
        F.when(x.isNull(), F.lit(None).cast("double"))
        .when(var > 0, (x - F.col("__m")) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return df.join(F.broadcast(stats), by).select(
        "event_id",
        by,
        F.round(F.lit(1000000.0) * z).cast("bigint").alias("z_micro"),
        (F.abs(z) > F.lit(float(z_threshold))).alias("is_anomaly"),
    )
