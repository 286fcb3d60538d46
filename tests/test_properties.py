"""Property-based tests (hypothesis): Spark operators vs pure-python
replicas over randomized inputs — the fixture-driven suites pin hand
cases; these pin the ALGEBRA (coverage/window laws of chunking, the
cohort identity, the DSIR linear statistic) on inputs nobody hand-picked.

Each example runs one Spark job, so max_examples is kept small and
deadlines are off (JVM scheduling noise would flake any wall-clock
bound).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from k8stream_spark.analytics import events as evan
from k8stream_spark.analytics import text as ta

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@PROP
@given(
    ns=st.lists(st.integers(0, 150), min_size=1, max_size=6),
    chunk=st.integers(2, 12),
    stride_frac=st.integers(1, 12),
)
def test_chunk_overlap_matches_python_replica(spark, ns, chunk, stride_frac):
    stride = max(1, min(chunk, stride_frac))
    rows = [
        (i, " ".join(f"d{i}t{j}" for j in range(n)) if n else "")
        for i, n in enumerate(ns)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.chunk_id, r.start_token, r.n_chunk_tokens, r.chunk_text)
        for r in ta.chunk_overlap(
            df, chunk_tokens=chunk, stride=stride
        ).collect()
    }
    expect = set()
    for i, txt in rows:
        toks = txt.split(" ")  # '' -> [''] — one empty token, like split()
        n = len(toks)
        n_starts = 1 if n <= chunk else (n - chunk + stride - 1) // stride + 1
        for ci in range(n_starts):
            w = toks[ci * stride : ci * stride + chunk]
            expect.add((i, ci, ci * stride, len(w), " ".join(w)))
    assert got == expect
    # law: every token index is covered by >=1 chunk
    for i, txt in rows:
        toks = txt.split(" ")
        covered = set()
        for (d, ci, s, ln, _t) in expect:
            if d == i:
                covered |= set(range(s, s + ln))
        assert covered == set(range(len(toks)))


@PROP
@given(
    events=st.lists(
        st.tuples(st.integers(1, 6), st.integers(0, 60)),  # (user, day)
        min_size=1,
        max_size=40,
    )
)
def test_retention_cohorts_matches_python_replica(spark, events):
    import datetime as dt

    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d))
        for u, d in events
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        (r.cohort_week, r.week_offset): (r.n_users, r.n_events)
        for r in evan.retention_cohorts(df).collect()
    }
    # python replica on integer week epochs (2024-01-01 = Monday, epoch
    # day 19723; anchor 1970-01-05 = epoch day 4)
    weeks = [(u, (19723 + d - 4) // 7) for u, d in events]
    first = {}
    for u, w in weeks:
        first[u] = min(first.get(u, w), w)
    cells: dict[tuple[int, int], set] = {}
    counts: dict[tuple[int, int], int] = {}
    for u, w in weeks:
        key = (first[u], w - first[u])
        cells.setdefault(key, set()).add(u)
        counts[key] = counts.get(key, 0) + 1
    expect = {k: (len(v), counts[k]) for k, v in cells.items()}
    assert got == expect


@PROP
@given(
    docs=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
                min_size=1,
                max_size=8,
            ),
            st.sampled_from(["en", "fr", None]),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_dsir_importance_matches_python_replica(spark, docs):
    rows = [
        (i, " ".join(toks), lang) for i, (toks, lang) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {
        r.doc_id: (r.n_tokens, int(r.score))
        for r in ta.dsir_importance(df).collect()
    }

    def bucket(tok: str) -> int:
        return (
            int(hashlib.md5(f"dsir-v1:{tok}".encode()).hexdigest()[:8], 16)
            % 1024
        )

    p: dict[int, int] = {}
    q: dict[int, int] = {}
    for i, txt, lang in rows:
        for tok in txt.split(" "):
            b = bucket(tok)
            q[b] = q.get(b, 0) + 1
            if lang == "en":
                p[b] = p.get(b, 0) + 1
    P, Q = sum(p.values()), sum(q.values())
    expect = {}
    for i, txt, lang in rows:
        toks = txt.split(" ")
        score = sum(p.get(bucket(t), 0) * Q - q[bucket(t)] * P for t in toks)
        expect[i] = (len(toks), score)
    assert got == expect


@PROP
@given(
    groups=st.lists(
        st.tuples(st.integers(1, 400), st.integers(0, 3)),
        min_size=1,
        max_size=3,
    )
)
def test_hll_user_counts_matches_python_replica(spark, groups):
    """Replayable-HLL law over random cardinalities: the Spark sketch
    equals a pure-python replica of the same register algebra (not just
    an error bound — the estimate is deterministic)."""
    import math

    rows = []
    eid = 0
    for gi, (n_users, offset) in enumerate(groups):
        for u in range(n_users):
            rows.append((eid, f"t{gi}", u * 7 + offset))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, user_id bigint"
    )
    got = {r.event_type: r for r in evan.hll_user_counts(df).collect()}
    # python replica
    m = 512
    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set] = {}
    for _, t, u in rows:
        h = int(hashlib.sha256(str(u).encode()).hexdigest()[:15], 16)
        idx, rem = h & (m - 1), h >> 9
        rank = 52 - rem.bit_length() if rem else 52
        regs.setdefault(t, {})
        regs[t][idx] = max(regs[t].get(idx, 0), rank)
        exact.setdefault(t, set()).add(u)
    for t, rs in regs.items():
        s = sum(1 << (52 - mm) for mm in rs.values())
        v = m - len(rs)
        s += v << 52
        e = (0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << 52)) / float(s)
        if e <= 2.5 * m and v > 0:
            e = float(m) * math.log(float(m) / v)
        assert got[t].hll_users == round(e), t
        assert got[t].exact_users == len(exact[t])


@PROP
@given(
    vals=st.lists(
        st.integers(1, 50000), min_size=1, max_size=120
    )
)
def test_value_quantiles_sketch_nearest_rank_law(spark, vals):
    """Sketch law on random values: each estimate is the bin lower edge
    of the nearest-rank order statistic, within one bin width below."""
    import math

    rows = [(i, "g", v / 100.0) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    )
    r = evan.value_quantiles_sketch(df).collect()[0]
    ordered = sorted(v / 100.0 for v in vals)
    n = len(ordered)
    assert r.n_events == n
    for q, est in ((0.5, r.p50_est), (0.95, r.p95_est)):
        target = ordered[math.ceil(q * n) - 1]
        assert target - 0.011 <= est <= target + 1e-9


@PROP
@given(
    # Random corpora built from substrings of one base text: guarantees
    # containment structure (chains included) without hand-picking it.
    spans=st.lists(
        st.tuples(st.integers(0, 300), st.integers(40, 400)),
        min_size=2,
        max_size=6,
    ),
    seed=st.integers(0, 3),
)
def test_containment_roots_invariants(spark, spans, seed):
    """Laws of containment_roots on randomized substring corpora:
    (1) one output row per input doc; (2) kept docs are their own root;
    (3) every root_id refers to a KEPT doc (the operator's whole point:
    raw contained_in pointers may name dropped docs, roots never do);
    (4) the kept/dropped partition matches containment_dedup exactly."""
    import random

    from k8stream_spark.analytics.dedup import (
        containment_dedup,
        containment_roots,
    )

    rng = random.Random(seed)
    words = "alpha bravo charlie delta echo foxtrot golf hotel".split()
    base = " ".join(rng.choice(words) for _ in range(200))
    rows = [
        (i, base[s % len(base): (s % len(base)) + ln])
        for i, (s, ln) in enumerate(spans)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    roots = {r.doc_id: r for r in containment_roots(df).collect()}
    dd = {r.doc_id: r for r in containment_dedup(df).collect()}

    assert set(roots) == {i for i, _ in rows}                      # (1)
    kept_ids = {i for i, r in roots.items() if r.kept}
    for i, r in roots.items():
        if r.kept:
            assert r.root_id == i                                  # (2)
        assert r.root_id in kept_ids                               # (3)
        assert dd[i].kept == r.kept                                # (4)


# ---------------------------------------------------------------------------
# r10 integer-exactness recipes: the driver-side PCA loop and the
# sign-symmetric deflation must agree with a DuckDB replay of the SAME
# formulas on adversarial values nobody hand-picked.  Pure DuckDB —
# no Spark job per example — so these afford many examples.
# ---------------------------------------------------------------------------

FAST = settings(max_examples=40, deadline=None)


@FAST
@given(
    cells=st.lists(
        st.integers(-3_000_000, 3_000_000), min_size=16, max_size=16
    ),
    steps=st.integers(1, 6),
)
def test_pca_power_iterate_matches_duckdb_chain(cells, steps):
    """_pca_power_iterate vs a DuckDB unrolled chain over a literal 4x4
    integer covariance: every w/norm/v value must agree bit-for-bit —
    the exactness argument (int64 sums + floor(x+0.5) single IEEE
    steps) tested on random signed matrices, not just the fixture."""
    import duckdb

    from k8stream_spark.analytics.similarity import _pca_power_iterate

    dim = 4
    cov = {
        (i, j): cells[i * dim + j] for i in range(dim) for j in range(dim)
    }
    v, lam = _pca_power_iterate(cov, dim, steps)

    values = ", ".join(
        f"({i}, {j}, {c})" for (i, j), c in sorted(cov.items())
    )
    parts = [
        f"cov(i, j, c) AS (SELECT * FROM (VALUES {values}))",
        f"""v0 AS (
          SELECT dd.d, CAST(FLOOR(1000000.0 / sqrt({dim}) + 0.5) AS BIGINT)
                   AS v
          FROM (SELECT unnest(generate_series(0, {dim - 1})) AS d) dd
        )""",
    ]
    prev = "v0"
    for k in range(1, steps + 1):
        parts.append(
            f"""w{k} AS MATERIALIZED (
          SELECT cov.i AS d,
                 CAST(FLOOR((SUM(cov.c * {prev}.v) + 500000)
                            / 1000000.0) AS BIGINT) AS w
          FROM cov JOIN {prev} ON cov.j = {prev}.d GROUP BY cov.i
        )"""
        )
        parts.append(
            f"""n{k} AS MATERIALIZED (
          SELECT CAST(SUM(w * w) AS DOUBLE) AS norm2 FROM w{k}
        )"""
        )
        parts.append(
            f"""v{k} AS MATERIALIZED (
          SELECT d, CASE WHEN norm2 > 0
                         THEN CAST(FLOOR(1000000.0 * w / sqrt(norm2)
                                         + 0.5) AS BIGINT)
                         ELSE 0 END AS v
          FROM w{k}, n{k}
        )"""
        )
        prev = f"v{k}"
    sql = (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT v{steps}.d, v{steps}.v,
               CASE WHEN n{steps}.norm2 > 0
                    THEN CAST(FLOOR(sqrt(n{steps}.norm2) + 0.5) AS BIGINT)
                    ELSE 0 END
        FROM v{steps}, n{steps} ORDER BY 1"""
    )
    rows = duckdb.sql(sql).fetchall()
    assert [r[1] for r in rows] == v
    assert {r[2] for r in rows} == {lam}


@FAST
@given(
    lam=st.integers(0, 200_000_000),
    vi=st.integers(-1_000_000, 1_000_000),
    vj=st.integers(-1_000_000, 1_000_000),
    c=st.integers(-3_000_000, 3_000_000),
)
def test_pca_deflate_division_matches_duckdb(lam, vi, vj, c):
    """The sign-symmetric integer division (DuckDB // truncates toward
    zero, Python // floors — the formula must mask the difference) on
    random signed products up to ~2e20."""
    import duckdb

    from k8stream_spark.analytics.similarity import _pca_deflate

    out = _pca_deflate({(0, 0): c}, [vi, vj], lam, 1)[(0, 0)]
    sql = f"""
        SELECT {c} - (CASE WHEN p >= 0
                           THEN (p + 500000000000) // 1000000000000
                           ELSE -((-p + 500000000000) // 1000000000000)
                      END)
        FROM (SELECT CAST({lam} AS HUGEINT) * {vi} * {vi} AS p)
    """
    assert duckdb.sql(sql).fetchone()[0] == out


@FAST
@given(
    budget=st.integers(1, 10_000_000),
    actual=st.integers(0, 5_000_000),
    raw=st.integers(1, 20),
)
def test_mixture_plan_arithmetic_matches_duckdb(budget, actual, raw):
    """target/rate/expected integer chain on random non-negative values
    (Spark div == DuckDB // == Python // holds only on non-negatives —
    that precondition is the operator's documented contract)."""
    import duckdb

    target = (budget * raw) // 210
    rate = (
        min(1_000_000, (target * 1_000_000) // actual) if actual > 0 else 0
    )
    expected = (actual * rate) // 1_000_000
    # BIGINT casts mirror the real oracle's column types — bare DuckDB
    # literals are INT32 and (target * 1000000) would overflow.
    t = f"((CAST({budget} AS BIGINT) * {raw}) // 210)"
    r = (
        f"(CASE WHEN {actual} > 0 THEN least(1000000, "
        f"({t} * CAST(1000000 AS BIGINT)) // {actual}) ELSE 0 END)"
    )
    row = duckdb.sql(
        f"""
        SELECT {t} AS target, {r} AS rate,
               (CAST({actual} AS BIGINT) * {r}) // 1000000 AS expected
        """
    ).fetchone()
    assert row == (target, rate, expected)
