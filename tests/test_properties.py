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
