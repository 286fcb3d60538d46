"""Event analytics: session-window equivalence, exact quantiles, HLL
sketch accuracy."""

from __future__ import annotations

from k8stream_spark.analytics import events as evan
from k8stream_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_session_window_matches_windowfn_sessionize(spark):
    ev = load_table(spark, SF_DIR, "events")
    native = evan.session_window_agg(ev)
    classic = evan.sessionize(ev)
    # same number of sessions per user (both split on >= 30 min gaps;
    # sessionize truncates to seconds, so compare at session granularity)
    n_native = {
        (r.user_id,): r.n
        for r in native.groupBy("user_id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    n_classic = {
        (r.user_id,): r.n
        for r in classic.groupBy("user_id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert n_native == n_classic


def test_session_window_gap_boundary(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(minutes=29)),      # merges (< gap)
        (1, 3, t0 + dt.timedelta(minutes=59)),      # exactly 30 min → MERGES
        (1, 4, t0 + dt.timedelta(minutes=89, seconds=1)),  # > gap → NEW
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp_ntz"
    )
    out = evan.session_window_agg(df).collect()
    assert sorted(r.n_events for r in out) == [1, 3]


def test_value_quantiles_ordering(spark):
    ev = load_table(spark, SF_DIR, "events")
    for r in evan.value_quantiles(ev).collect():
        assert r.p50 <= r.p95


def test_approx_user_counts_error_bound(spark):
    ev = load_table(spark, SF_DIR, "events")
    for r in evan.approx_user_counts(ev).collect():
        rel = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel <= 0.15, f"{r.event_type}: rel err {rel}"


def test_value_quantiles_sketch_bounds_exact(spark):
    """The bin-sketch quantile lands within one bin width of the exact
    interpolated percentile; hand case: 100 values 0.01..1.00 -> p50
    within a bin of 0.50.  (Bin ids at EXACT bin edges depend on how
    the IEEE quotient rounds — both engines compute the identical
    double division, so parity holds either way, and the estimate
    error stays <= one bin width; assert with tolerance, not exact bin
    ids.)"""
    import math
    from collections import defaultdict

    ev = load_table(spark, SF_DIR, "events")
    vals = defaultdict(list)
    for r in ev.select("event_type", "value").collect():
        if r.value is not None:
            vals[r.event_type].append(r.value)
    sk = {r.event_type: r for r in evan.value_quantiles_sketch(ev).collect()}
    assert set(sk) == set(vals)
    for t, r in sk.items():
        ordered = sorted(vals[t])
        n = len(ordered)
        assert r.n_events == n
        # the sketch's contract is the NEAREST-RANK quantile (the
        # ceil(q*n)-th order statistic), not the interpolated one —
        # on sparse data those can sit a whole data gap apart.  The
        # lower-edge estimate lands within one bin width below it.
        for q, est in ((0.5, r.p50_est), (0.95, r.p95_est)):
            target = ordered[math.ceil(q * n) - 1]
            assert target - 0.011 <= est <= target + 1e-9, (t, q)
    hand = spark.createDataFrame(
        [(i, "t", round(i / 100.0, 2)) for i in range(1, 101)],
        "event_id bigint, event_type string, value double",
    )
    row = evan.value_quantiles_sketch(hand).collect()[0]
    assert row.n_events == 100
    assert abs(row.p50_est - 0.5) <= 0.01
    assert abs(row.p95_est - 0.95) <= 0.01


def test_hll_user_counts_replayable(spark):
    """The replayable HLL lands within its stated bound on the fixture
    and on a hand-built frame with a known cardinality."""
    ev = load_table(spark, SF_DIR, "events")
    for r in evan.hll_user_counts(ev).collect():
        assert r.within_bound, (
            f"{r.event_type}: hll {r.hll_users} vs exact {r.exact_users}"
        )
    # 1000 distinct users in one type: estimate within 15 %
    hand = spark.createDataFrame(
        [(i, "t", i % 1000) for i in range(3000)],
        "event_id bigint, event_type string, user_id bigint",
    )
    row = evan.hll_user_counts(hand).collect()[0]
    assert row.exact_users == 1000
    assert abs(row.hll_users - 1000) <= 150
    # NULL user_ids are ignored by both the sketch and the witness
    with_null = hand.union(
        spark.createDataFrame(
            [(99999, "t", None)],
            "event_id bigint, event_type string, user_id bigint",
        )
    )
    row2 = evan.hll_user_counts(with_null).collect()[0]
    assert (row2.exact_users, row2.hll_users) == (
        row.exact_users, row.hll_users
    )


def test_asof_join_backward_inclusive(spark):
    """Backward as-of semantics: latest right row with ts <= left ts wins,
    ties are inclusive, and rows with no prior state get null."""
    import datetime as dt

    from k8stream_spark.analytics.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", t(5)), (2, "u", t(10)), (3, "u", t(2)), (4, "v", t(9))],
        "event_id bigint, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", t(3), 30.0), ("u", t(10), 100.0), ("v", t(20), 7.0)],
        "user_id string, ts timestamp, value double",
    )
    out = {
        r.event_id: r.value_asof
        for r in asof_join(
            left, right, key="user_id", right_values=("value",)
        ).collect()
    }
    assert out[1] == 30.0     # t=5: state from t=3
    assert out[2] == 100.0    # t=10: tie is inclusive
    assert out[3] is None     # t=2: no prior state
    assert out[4] is None     # v: state only at t=20, after the event


def test_rolling_user_stats_frame(spark):
    import datetime as dt

    from k8stream_spark.analytics.events import rolling_user_stats

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    df = spark.createDataFrame(
        [(i, "u", t(i), float(i)) for i in range(1, 15)],
        "event_id bigint, user_id string, ts timestamp, value double",
    )
    rows = {r.event_id: r for r in rolling_user_stats(df, window_rows=10).collect()}
    assert rows[1].rolling_n == 1 and rows[1].rolling_sum == 1.0
    assert rows[10].rolling_n == 10 and rows[10].rolling_sum == sum(range(1, 11))
    # row 14: frame = values 5..14 (10 rows)
    assert rows[14].rolling_n == 10
    assert rows[14].rolling_sum == sum(range(5, 15))
    assert rows[14].rolling_max == 14.0


def test_asof_join_null_value_in_latest_row_wins(spark):
    """A NULL value in the LATEST matching right row must come through as
    NULL (ASOF semantics), not be skipped in favor of a stale older value."""
    import datetime as dt

    from k8stream_spark.analytics.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", t(12))], "event_id bigint, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", t(3), 30.0), ("u", t(10), None)],
        "user_id string, ts timestamp, value double",
    )
    out = asof_join(left, right, key="user_id", right_values=("value",))
    assert out.collect()[0].value_asof is None


def test_asof_join_null_key_never_matches(spark):
    """NULL keys never match (SQL ASOF/equi-join semantics): a NULL-key
    left row gets NULL state even when NULL-key right rows exist, and
    non-null keys are unaffected."""
    import datetime as dt

    from k8stream_spark.analytics.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, None, t(12)), (2, "u", t(12))],
        "event_id bigint, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, t(3), 99.0), ("u", t(5), 42.0)],
        "user_id string, ts timestamp, value double",
    )
    rows = {
        r.event_id: r.value_asof
        for r in asof_join(
            left, right, key="user_id", right_values=("value",)
        ).collect()
    }
    assert rows[1] is None   # NULL key inherits nothing
    assert rows[2] == 42.0   # non-null path unaffected


def test_funnel_requires_stage_order(spark):
    """A user who purchased BEFORE ever viewing does not count for the
    purchase stage; one who did view->click->purchase counts everywhere."""
    import datetime as dt

    from k8stream_spark.analytics.events import funnel_counts

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = []
    # u1: proper order
    rows += [(1, "u1", "view", t(1)), (2, "u1", "click", t(2)),
             (3, "u1", "purchase", t(3))]
    # u2: purchase first -> only reaches 'view'
    rows += [(4, "u2", "purchase", t(1)), (5, "u2", "view", t(2))]
    # u3: view then click, no purchase
    rows += [(6, "u3", "view", t(1)), (7, "u3", "click", t(5))]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id string, event_type string, ts timestamp"
    )
    out = {r.stage: r.n_users for r in funnel_counts(df).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_retention_cohorts_offsets(spark):
    import datetime as dt

    def t(day):
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

    df = spark.createDataFrame(
        [
            # user 1: first week + comes back 1 and 2 weeks later
            (1, t(0)), (1, t(7)), (1, t(15)),
            # user 2: first week only (two events, one user)
            (2, t(1)), (2, t(2)),
            # user 3: joins a week later, returns the week after
            (3, t(8)), (3, t(14)),
        ],
        "user_id bigint, ts timestamp",
    )
    out = evan.retention_cohorts(df).collect()
    cohorts = sorted({r.cohort_week for r in out})
    base = cohorts[0]
    cells = {(r.cohort_week - base, r.week_offset): (r.n_users, r.n_events) for r in out}
    # 2024-01-01 is a Monday, so t(0..6) is one whole week
    assert cells[(0, 0)] == (2, 3)   # users 1,2 in their first week
    assert cells[(0, 1)] == (1, 1)   # user 1 back after 1 week
    assert cells[(0, 2)] == (1, 1)   # user 1 back after 2 weeks
    assert cells[(1, 0)] == (1, 1)   # user 3's cohort starts a week later
    assert cells[(1, 1)] == (1, 1)


def test_window_range_counts_binned_equi_join(spark):
    import datetime as dt

    from k8stream_spark.analytics.events import window_range_counts

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        (1, at(0)),       # window 0 [0, 3600)
        (2, at(3599)),    # window 0 boundary-inclusive end-1
        (2, at(3600)),    # gap — in no window (window 0 ends at 3600)
        (3, at(7200)),    # window 1 [7200, 10800) start boundary
        (1, at(14400)),   # window 2
        (9, at(14401)),   # window 2
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {
        r.window_id: r
        for r in window_range_counts(
            df, n_windows=4, stride_s=7200, len_s=3600, bin_s=3600
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert (out[0].n_events, out[0].n_users) == (2, 2)
    assert (out[1].n_events, out[1].n_users) == (1, 1)
    assert (out[2].n_events, out[2].n_users) == (2, 2)
    # the empty window survives with zero counts
    assert (out[3].n_events, out[3].n_users) == (0, 0)
    # window boundaries anchored at the corpus min
    assert out[0].start_s + 7200 == out[1].start_s
    assert out[0].end_s - out[0].start_s == 3600


def test_window_range_counts_plan_has_no_nested_loop(spark):
    import datetime as dt

    from k8stream_spark.analytics.events import window_range_counts

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i % 7, t0 + dt.timedelta(seconds=i * 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    q = window_range_counts(df)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    # The point of the bin decomposition: the containment test must ride
    # an equi-join, never an O(events x windows) nested loop.
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_distinct_counts_exactness(spark):
    from k8stream_spark.analytics.events import salted_distinct_counts

    # Duplicated targets across rows — the case a random (non-target-
    # derived) salt would double count.
    rows = [("a", u) for u in [1, 1, 2, 3, 3, 3, 4]] + [
        ("b", u) for u in [1, 5, 5]
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id bigint")
    for n_salts in (1, 4, 64):
        out = {
            r.event_type: r
            for r in salted_distinct_counts(df, n_salts=n_salts).collect()
        }
        assert (out["a"].n_distinct, out["a"].n_events) == (4, 7)
        assert (out["b"].n_distinct, out["b"].n_events) == (2, 3)


def test_anomaly_zscore_hand_values(spark):
    """Hand-computed z flags: an injected spike is flagged, the bulk is
    not, zero-variance groups flag nothing."""
    import math

    from pyspark.sql import functions as F

    from k8stream_spark.analytics import events as ev

    rows = [(i, "a", 10.0) for i in range(20)] + [
        (100, "a", 1000.0),          # spike
        (200, "b", 5.0),
        (201, "b", 5.0),             # constant group: s = 0
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    )
    out = {r.event_id: r for r in ev.anomaly_zscore(df).collect()}
    assert out[100].is_anomaly
    assert not out[0].is_anomaly
    assert not out[200].is_anomaly and out[200].z_micro == 0
    # replica of the rounding discipline for the spike
    n = 21
    m = round((20 * 10.0 + 1000.0) / n, 6)
    m2 = round((20 * 100.0 + 1000000.0) / n, 6)
    s = math.sqrt(m2 - m * m)
    assert out[100].z_micro == round(1e6 * (1000.0 - m) / s)


def test_anomaly_zscore_negative_rounded_variance(spark):
    """Constant group whose value has 7+ decimals: independent 6-dp
    rounding makes m2 − m² slightly negative (m = round(1.4999996, 6)
    = 1.5 so m² = 2.25, but m2 = round(2.2499988, 6) = 2.249999).  The
    variance guard must pin z to 0 — the old sqrt-result guard turned
    this into NaN > 0 (TRUE in Spark) and a CAST_OVERFLOW abort."""
    from k8stream_spark.analytics import events as ev

    rows = [(0, "c", 1.4999996), (1, "c", 1.4999996), (2, "c", 1.4999996)]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    )
    out = {r.event_id: r for r in ev.anomaly_zscore(df).collect()}
    assert all(out[i].z_micro == 0 for i in range(3))
    assert not any(out[i].is_anomaly for i in range(3))
