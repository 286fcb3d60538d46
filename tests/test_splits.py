"""Deterministic dataset splitting / stratified sampling
(analytics/splits.py): membership is a pure function of (seed, id)."""

from __future__ import annotations

from k8stream_spark.analytics.splits import dataset_split, stratified_sample


def test_dataset_split_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id bigint")
    a = {r.doc_id: r.split for r in dataset_split(df).collect()}
    b = {r.doc_id: r.split for r in dataset_split(df).collect()}
    assert a == b  # rerun-stable
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 800  # ~90% of 1000, hash-uniform
    assert 20 < counts["val"] < 90 and 20 < counts["test"] < 90


def test_dataset_split_seed_changes_assignment(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id bigint")
    a = {r.doc_id: r.split for r in dataset_split(df, seed="s1").collect()}
    b = {r.doc_id: r.split for r in dataset_split(df, seed="s2").collect()}
    assert a != b


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "common") for i in range(1000)] + [
        (10000 + i, "rare") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, cls string")
    kept = stratified_sample(
        df, class_col="cls", rates={"common": 10}, id_col="doc_id"
    ).collect()
    n_common = sum(1 for r in kept if r.cls == "common")
    n_rare = sum(1 for r in kept if r.cls == "rare")
    assert n_rare == 50          # default_rate=100 keeps every rare row
    assert 50 < n_common < 180   # ~10% of 1000
    again = stratified_sample(
        df, class_col="cls", rates={"common": 10}, id_col="doc_id"
    ).collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in again)


def test_pack_chunks_prefix_sum_layout(spark):
    from k8stream_spark.analytics.splits import pack_chunks

    df = spark.createDataFrame(
        [(i, 100) for i in range(10)], "doc_id bigint, n_tokens bigint"
    )
    rows = sorted(
        pack_chunks(df, capacity=250).collect(), key=lambda r: r.pack_pos
    )
    # 10 docs x 100 tokens into 250-token windows: cumsum boundaries at
    # positions 3 (crosses 250) and 5 (crosses 500) etc.
    assert rows[0].start_chunk == 0 and rows[0].end_chunk == 0
    cum = 0
    for r in rows:
        assert r.start_chunk == cum // 250
        assert r.end_chunk == (cum + r.n_tokens - 1) // 250
        cum += r.n_tokens
    # deterministic rerun
    again = sorted(
        pack_chunks(df, capacity=250).collect(), key=lambda r: r.pack_pos
    )
    assert [r.doc_id for r in rows] == [r.doc_id for r in again]


def test_pack_chunks_sharded_invariants(spark):
    from k8stream_spark.analytics.splits import pack_chunks, pack_chunks_sharded

    df = spark.createDataFrame(
        [(i, 30 + (i * 17) % 90) for i in range(200)],
        "doc_id bigint, n_tokens bigint",
    )
    rows = pack_chunks_sharded(df, capacity=100, n_shards=4).collect()
    assert len(rows) == 200 and len({r.doc_id for r in rows}) == 200

    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1  # the hash actually spreads shards

    base_expected = 0
    for shard in sorted(by_shard):
        docs = sorted(by_shard[shard], key=lambda r: r.pack_pos)
        assert [r.pack_pos for r in docs] == list(range(1, len(docs) + 1))
        # per-shard prefix-sum invariant, offset by the shard's base
        base = docs[0].start_chunk
        assert base == base_expected  # contiguous, disjoint chunk spaces
        cum = 0
        for r in docs:
            assert r.start_chunk == base + cum // 100
            assert r.end_chunk == base + (cum + r.n_tokens - 1) // 100
            cum += r.n_tokens
        base_expected = base + (cum - 1) // 100 + 1

    # n_shards=1 reproduces the unsharded layout row-for-row
    one = {
        (r.doc_id, r.pack_pos, r.start_chunk, r.end_chunk)
        for r in pack_chunks_sharded(df, capacity=100, n_shards=1).collect()
    }
    flat = {
        (r.doc_id, r.pack_pos, r.start_chunk, r.end_chunk)
        for r in pack_chunks(df, capacity=100).collect()
    }
    assert one == flat


def test_source_temperature_sample_exact_membership(spark):
    """Membership is exactly the documented all-integer predicate:
    H·denom·n_s < S_s·m·2^32 with H the 32-bit md5 bucket — recomputed
    here in pure Python from hashlib."""
    import hashlib
    import math

    from k8stream_spark.analytics.splits import source_temperature_sample

    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = {r.doc_id for r in source_temperature_sample(df).collect()}

    n = {"big": 80, "small": 20}
    s = {k: math.floor(math.sqrt(v * 1000000)) for k, v in n.items()}
    denom = sum(s.values())
    m = (100 * 30) // 100
    expected = set()
    for doc_id, src in rows:
        h = int(hashlib.md5(f"mix-v1:{doc_id}".encode()).hexdigest()[:8], 16)
        if h * denom * n[src] < s[src] * m * 2**32:
            expected.add(doc_id)
    assert got == expected
    # temperature flattening: the small source is up-weighted — its
    # sqrt-share (sqrt(20)/(sqrt(80)+sqrt(20)) = 1/3) exceeds its raw
    # share (1/5), so its sampling RATE must exceed the big source's.
    rate_small = s["small"] * m / (denom * n["small"])
    rate_big = s["big"] * m / (denom * n["big"])
    assert rate_small > rate_big
    # determinism: a rerun picks the identical sample
    again = {r.doc_id for r in source_temperature_sample(df).collect()}
    assert again == got


def test_source_temperature_sample_uniform_sources(spark):
    """With equal source sizes the temperature is a no-op: every source
    samples at ~target_pct and the overall fraction lands there too."""
    from k8stream_spark.analytics.splits import source_temperature_sample

    rows = [(i, f"s{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = source_temperature_sample(df, target_pct=50).collect()
    frac = len(got) / 400
    assert 0.4 < frac < 0.6  # md5-uniform, 400 trials


def test_global_shuffle_matches_python_md5(spark):
    """Shard and in-shard position are pure functions of md5(seed:id) —
    recomputed here with hashlib; positions are contiguous per shard."""
    import hashlib

    from k8stream_spark.analytics.splits import global_shuffle

    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id bigint"
    )
    got = {r.doc_id: (r.shard, r.pos) for r in global_shuffle(df).collect()}
    assert len(got) == 200

    def md5int(doc_id, lo, hi):
        h = hashlib.md5(f"shuffle-v1:{doc_id}".encode()).hexdigest()
        return int(h[lo:hi], 16)

    by_shard = {}
    for i in range(200):
        by_shard.setdefault(md5int(i, 0, 8) % 8, []).append(
            (md5int(i, 8, 16), i)
        )
    expected = {}
    for shard, members in by_shard.items():
        for pos, (_, doc_id) in enumerate(sorted(members), start=1):
            expected[doc_id] = (shard, pos)
    assert got == expected
    # per-shard positions are 1..n with no gaps
    for shard, members in by_shard.items():
        ps = sorted(p for d, (s, p) in got.items() if s == shard)
        assert ps == list(range(1, len(members) + 1))


def test_source_quota_cap_exact_and_thin_equivalent(spark):
    """The cap keeps exactly quota rows per large-enough source, ranked
    by (md5 hash, id); the broadcast pre-thin scale path must be
    row-identical to the plain-window form (thin_margin=None), and a
    python md5 re-derivation pins the membership."""
    import hashlib

    from k8stream_spark.analytics.splits import source_quota_cap

    rows = [(i, f"s{i % 3}") for i in range(300)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    quota = 10

    plain = source_quota_cap(df, quota=quota, thin_margin=None).collect()
    thinned = source_quota_cap(df, quota=quota, thin_margin=4).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, thinned))

    by_src = {}
    for r in plain:
        by_src.setdefault(r.source, []).append(r)
    assert {s: len(v) for s, v in by_src.items()} == {
        "s0": quota, "s1": quota, "s2": quota, "tiny": 1
    }
    # membership check against a python re-derivation of the hash order
    def okey(doc_id):
        return int(hashlib.md5(f"quota-v1:{doc_id}".encode()).hexdigest()[:8], 16)

    for src, members in by_src.items():
        ids = [i for i, s in rows if s == src]
        expect = sorted(ids, key=lambda i: (okey(i), i))[:quota]
        got = [r.doc_id for r in sorted(members, key=lambda r: r.rank)]
        assert got == expect


def test_shard_manifest_totals_and_determinism(spark):
    import hashlib

    from k8stream_spark.analytics import splits

    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 1))) for i in range(40)],
        "doc_id bigint, text string",
    )
    out = splits.shard_manifest(df, n_shards=4).collect()
    assert sum(r.n_docs for r in out) == 40
    assert sum(r.n_tokens for r in out) == sum(i + 1 for i in range(40))
    # python-side replica of the md5 shard hash: same assignment + checksum
    acc = {}
    for i in range(40):
        okey = int(hashlib.md5(f"shard-v1:{i}".encode()).hexdigest()[:8], 16)
        s = okey % 4
        n, x = acc.get(s, (0, 0))
        acc[s] = (n + 1, x ^ okey)
    for r in out:
        assert acc[r.shard_id][0] == r.n_docs
        assert acc[r.shard_id][1] == r.xor_checksum
    # stable under arbitrary input partitioning
    again = {r.shard_id: r for r in splits.shard_manifest(df.repartition(7), n_shards=4).collect()}
    for r in out:
        assert again[r.shard_id].xor_checksum == r.xor_checksum


def test_split_leakage_hand_case(spark):
    from k8stream_spark.analytics import splits as sp

    # Force split membership by choosing weights over a known bucket:
    # use weights (50, 0, 50) -> bucket < 50 is train, else test.
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c x y"),
            (3, "p q r s t"),
            (4, "a b c d z"),
            (5, "m n o p q"),
        ],
        "doc_id bigint, text string",
    )
    out = sp.split_leakage(
        df, weights=(50, 0, 50), names=("train", "val", "test")
    ).collect()
    # cross-check against a python replica of the same md5 split + grams
    import hashlib

    def bucket(i):
        return int(hashlib.md5(f"split-v1:{i}".encode()).hexdigest()[:8], 16) % 100

    def grams(s):
        tk = s.split(" ")
        return {" ".join(tk[i:i+3]) for i in range(len(tk) - 2)}

    rows = {r[0]: r for r in df.collect()}
    train_g = set()
    for i, (_, txt) in rows.items():
        if bucket(i) < 50:
            train_g |= grams(txt)
    expect = {}
    for i, (_, txt) in rows.items():
        if bucket(i) >= 50:
            g = grams(txt)
            expect[i] = (len(g), len(g & train_g))
    got = {r.doc_id: (r.n_ngrams, r.n_leaked) for r in out}
    assert got == expect and len(expect) > 0


def test_mixture_plan_rates_and_clamp(spark):
    """Integer plan arithmetic by hand: a source under budget clamps to
    rate 1.0; one over budget gets target*1e6 div actual and the
    matching expected yield."""
    from k8stream_spark.analytics.splits import mixture_plan

    rows = (
        [(f"d0-{i}", "a b c", "src0") for i in range(2)]
        + [(f"d19-{i}", " ".join(["w"] * 500), "src19") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id string, text string, source string")
    out = {r.source: r for r in mixture_plan(df).collect()}
    s0 = out["src0"]  # raw 20: target (100000*20)//210 = 9523
    assert (s0.n_docs, s0.actual_tokens, s0.target_tokens) == (2, 6, 9523)
    assert s0.rate_micro == 1_000_000 and s0.expected_tokens == 6
    s19 = out["src19"]  # raw 1: target 476 < actual 1000
    assert (s19.actual_tokens, s19.target_tokens) == (1000, 476)
    assert s19.rate_micro == 476_000 and s19.expected_tokens == 476


def test_mixture_plan_safe_on_real_world_source_names(spark):
    """Non-srcN names and N >= n_sources must yield weight 0 (target 0,
    rate 0) — never a cast error or a negative target."""
    from k8stream_spark.analytics.splits import mixture_plan

    rows = [
        ("a", "x y z", "common-crawl"),  # no srcN match → weight 0
        ("b", "x y", "src99"),  # 20 - 99 < 0 → clamp to 0
        ("c", "x y z w", "src1"),  # ramp weight 19, unchanged
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, source string")
    out = {r.source: r for r in mixture_plan(df).collect()}
    for name in ("common-crawl", "src99"):
        r = out[name]
        assert r.target_tokens == 0 and r.rate_micro == 0
        assert r.expected_tokens == 0
    s1 = out["src1"]
    assert s1.target_tokens == (100_000 * 19) // 210
    assert s1.rate_micro == 1_000_000  # 4 tokens << target


def test_mixture_plan_explicit_weights(spark):
    """Caller-supplied weights map: named sources get budget*w//Σw,
    unnamed sources get 0; negative weights clamp to 0."""
    from k8stream_spark.analytics.splits import mixture_plan

    rows = [
        ("a", " ".join(["t"] * 900), "web"),
        ("b", " ".join(["t"] * 100), "books"),
        ("c", "x y", "junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, source string")
    out = {
        r.source: r
        for r in mixture_plan(
            df,
            budget_tokens=1000,
            weights={"web": 1, "books": 3, "bad": -5},
        ).collect()
    }
    assert out["web"].target_tokens == 250  # 1000*1//4
    assert out["books"].target_tokens == 750  # 1000*3//4
    assert out["junk"].target_tokens == 0 and out["junk"].rate_micro == 0
    # books: target 750 > actual 100 → rate clamps to 1.0
    assert out["books"].rate_micro == 1_000_000
    assert out["books"].expected_tokens == 100
    # web: 250*1e6 // 900 = 277777 micro → expected 900*277777//1e6 = 249
    assert out["web"].rate_micro == 277_777
    assert out["web"].expected_tokens == 249
