"""D1/D2 dedup semantics — reference handler.go:95-115,142-151.
Pins the lexicographic resourceVersion quirk (handler.go:111)."""

from __future__ import annotations

from k8stream_spark.ops import dedup


def test_dedup_first_seen_keeps_earliest(events_df):
    out = dedup.dedup_first_seen(
        events_df, keys=["uid"], order_by=["creation_ts", "ref_uid"]
    )
    rows = {r.uid: r.message for r in out.collect()}
    assert rows["e1"] == "msg"  # the seconds=0 row, not "dup of e1"
    assert out.count() == 5


def test_keep_latest_version_lexicographic_quirk(spark):
    # '9' >= '10' lexicographically — the reference string-compares
    # resourceVersion (handler.go:111), so version '9' wins over '10'.
    df = spark.createDataFrame(
        [("svc", "9", "old"), ("svc", "10", "new")],
        "uid string, resource_version string, payload string",
    )
    out = dedup.keep_latest_version(
        df, key="uid", version_col="resource_version"
    ).collect()
    assert len(out) == 1
    assert out[0].resource_version == "9"


def test_keep_latest_version_per_key(spark):
    df = spark.createDataFrame(
        [("a", "1"), ("a", "2"), ("b", "3")],
        "uid string, resource_version string",
    )
    out = {
        r.uid: r.resource_version
        for r in dedup.keep_latest_version(
            df, key="uid", version_col="resource_version"
        ).collect()
    }
    assert out == {"a": "2", "b": "3"}


def test_dedup_clusters_components(spark):
    """Chain a-b-c collapses to one cluster labeled by the min id;
    untouched docs are singleton canonicals."""
    from k8stream_spark.analytics.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = spark.createDataFrame(
        [
            (1, base + "alpha"),           # near-dup of 2
            (2, base + "beta"),            # near-dup of 1 and 3
            (3, base + "beta gamma"),      # near-dup of 2 (not of 1 directly)
            (10, "completely different text with no overlap at all here"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in dedup_clusters(docs, threshold=0.5).collect()}
    assert rows[1].cluster_id == 1 and rows[1].is_canonical
    assert rows[2].cluster_id == 1 and not rows[2].is_canonical
    assert rows[3].cluster_id == 1 and not rows[3].is_canonical
    assert rows[10].cluster_id == 10 and rows[10].is_canonical


def test_duplicate_spans_cross_doc_only(spark):
    """Spans shared across docs count; a doc with unique text counts 0;
    short docs yield no spans at all."""
    from k8stream_spark.analytics.dedup import duplicate_spans

    shared = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [
            (1, shared + " tail a"),
            (2, shared + " tail b"),
            (3, "totally different words " + " ".join(f"w{i}" for i in range(10))),
            (4, "short doc"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in duplicate_spans(docs, span_tokens=10).collect()}
    # docs 1 and 2 share the 10-token prefix window
    assert rows[1].n_dup_spans >= 1 and rows[2].n_dup_spans >= 1
    assert rows[3].n_dup_spans == 0 and rows[3].n_spans > 0
    assert rows[4].n_spans == 0 and rows[4].n_dup_spans == 0


def test_dedup_clusters_long_chain_converges_logarithmically(spark):
    """A 40-link near-dup chain (diameter ~40) must converge within
    max_iter=10 — only possible with the path-halving step (plain
    min-propagation needs ~40 rounds)."""
    from k8stream_spark.analytics.dedup import dedup_clusters

    vocab = [f"w{i}" for i in range(140)]
    docs = spark.createDataFrame(
        [(i, " ".join(vocab[i * 2 : i * 2 + 60])) for i in range(41)],
        "doc_id bigint, text string",
    )
    # consecutive docs share 58 of 60 tokens -> high shingle Jaccard
    rows = dedup_clusters(docs, threshold=0.5, max_iter=10).collect()
    clusters = {r.cluster_id for r in rows}
    assert clusters == {0}, f"expected one component, got {clusters}"
    assert sum(1 for r in rows if r.is_canonical) == 1


def test_eval_contamination_flags_leaked_ngrams(spark, docs_df):
    """Docs 1/2/6 share long 5-gram runs; with doc 1 as the eval set,
    the exact dup (6) must flag at overlap 1.0 and the near-dup (2) at a
    high fraction; unrelated docs must not appear.  Self-pairs excluded."""
    from k8stream_spark.analytics import dedup

    eval_set = docs_df.where("doc_id = 1")
    rows = {
        (r.doc_id, r.eval_doc_id): r
        for r in dedup.eval_contamination(
            docs_df, eval_set, shingle_n=5, min_frac=0.2
        ).collect()
    }
    assert (6, 1) in rows and rows[(6, 1)].overlap_frac == 1.0
    assert (2, 1) in rows and 0.5 < rows[(2, 1)].overlap_frac < 1.0
    assert (1, 1) not in rows  # self-pair excluded
    assert not any(d in (3, 4, 5, 7) for d, _ in rows)
    # n_overlap is the distinct-shingle intersection size
    n_sh = 13 - 5 + 1  # doc 1: 13 tokens, all 5-grams distinct
    assert rows[(6, 1)].n_overlap == n_sh


def test_eval_contamination_threshold_and_short_docs(spark):
    """Docs shorter than the shingle width yield no shingles (never a
    division by zero / false hit); min_frac prunes weak overlaps."""
    from k8stream_spark.analytics import dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e x y z"),  # shares exactly one 5-gram-less run
            (3, "tiny doc"),
        ],
        "doc_id bigint, text string",
    )
    out = dedup.eval_contamination(
        docs, docs.where("doc_id = 1"), shingle_n=5, min_frac=0.9
    ).collect()
    assert out == []  # doc 2 shares only 1/4 of doc 1's 5-grams
    out2 = dedup.eval_contamination(
        docs, docs.where("doc_id = 1"), shingle_n=5, min_frac=0.2
    ).collect()
    assert [(r.doc_id, r.n_overlap) for r in out2] == [(2, 1)]


def test_remove_boilerplate_drops_frequent_segments(spark):
    """3-token segments repeated across >= min_df docs vanish from every
    document; survivors keep their original order.  A doc that is pure
    boilerplate drops out entirely (it was all template)."""
    from k8stream_spark.analytics.dedup import remove_boilerplate

    boiler = "cookie banner text"
    rows = [
        (0, boiler + " alpha beta gamma"),
        (1, boiler + " delta eps zeta"),
        (2, boiler + " eta theta iota"),
        (3, "kappa lam mu " + boiler),
        (4, boiler),                       # pure boilerplate: drops out
        (5, "nu xi omicron pi rho sigma"),  # untouched
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           remove_boilerplate(df, seg_tokens=3, min_df=3).collect()}
    assert 4 not in out
    assert out[0].cleaned_text == "alpha beta gamma"
    assert out[3].cleaned_text == "kappa lam mu"
    assert out[5].cleaned_text == "nu xi omicron pi rho sigma"
    assert out[5].n_segments_kept == 2
    assert all(boiler not in r.cleaned_text for r in out.values())


def test_remove_boilerplate_ragged_tail_and_order(spark):
    """Token counts not divisible by seg_tokens produce a short trailing
    segment; reassembly preserves segment order."""
    from k8stream_spark.analytics.dedup import remove_boilerplate

    rows = [(0, "a b c d e"), (1, "f g h i j")]  # 2 segments each, no repeats
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           remove_boilerplate(df, seg_tokens=3, min_df=2).collect()}
    assert out[0].cleaned_text == "a b c d e"
    assert out[0].n_segments_kept == 2
    assert out[1].cleaned_text == "f g h i j"


def test_cluster_keep_longest_picks_longest_member(spark):
    from k8stream_spark.analytics.dedup import cluster_keep_longest

    base = [f"w{i}" for i in range(30)]
    rows = [
        (1, " ".join(base)),                      # 30 tokens
        (2, " ".join(base + ["extra", "tail"])),  # 32 tokens, near-dup of 1
        (3, " ".join(f"z{i}" for i in range(40))),  # unrelated singleton
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in cluster_keep_longest(df).collect()}
    assert len(out) == 3
    # docs 1 and 2 share a cluster; the longer doc 2 wins
    assert out[1].cluster_id == out[2].cluster_id
    assert out[2].kept and not out[1].kept
    assert out[2].n_tokens == 32 and out[1].n_tokens == 30
    # the singleton keeps itself
    assert out[3].kept and out[3].cluster_id == 3
    # exactly one kept row per cluster
    kept_per_cluster = {}
    for r in out.values():
        kept_per_cluster.setdefault(r.cluster_id, 0)
        kept_per_cluster[r.cluster_id] += r.kept
    assert all(v == 1 for v in kept_per_cluster.values())


def test_incremental_dedup_flags_and_survivors(spark):
    from k8stream_spark.analytics.dedup import incremental_dedup

    base = [f"w{i}" for i in range(30)]
    ref = spark.createDataFrame(
        [
            (0, " ".join(base)),
            (2, " ".join(f"r{i}" for i in range(30))),
        ],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [
            (11, " ".join(base)),                       # exact dup of ref 0
            (13, " ".join(base + ["tail", "bits"])),    # near-dup of ref 0
            (15, " ".join(f"q{i}" for i in range(30))), # unique
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in incremental_dedup(new, ref).collect()}
    assert set(out) == {11, 13, 15}
    assert out[11].is_exact_dup and not out[11].kept
    # the exact dup is also a near-dup (J = 1.0) of the same ref doc
    assert out[11].near_dup_of == 0 and out[11].max_jaccard == 1.0
    assert not out[13].is_exact_dup
    assert out[13].near_dup_of == 0 and not out[13].kept
    assert 0.8 <= out[13].max_jaccard < 1.0
    assert out[15].kept
    assert out[15].near_dup_of is None and out[15].max_jaccard is None


def test_incremental_dedup_never_pairs_new_with_new(spark):
    from k8stream_spark.analytics.dedup import incremental_dedup

    base = [f"w{i}" for i in range(30)]
    ref = spark.createDataFrame(
        [(0, " ".join(f"r{i}" for i in range(30)))],
        "doc_id bigint, text string",
    )
    # two new docs that are near-dups OF EACH OTHER but unrelated to ref:
    # within-batch duplication is out of scope (a separate pass) — both
    # must survive the incremental check.
    new = spark.createDataFrame(
        [
            (1, " ".join(base)),
            (3, " ".join(base + ["x"])),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in incremental_dedup(new, ref).collect()}
    assert out[1].kept and out[3].kept


def test_cluster_size_histogram_accounts_every_doc(spark):
    from k8stream_spark.analytics.dedup import cluster_size_histogram

    base = [f"w{i}" for i in range(30)]
    rows = [
        (1, " ".join(base)),
        (2, " ".join(base + ["x"])),            # near-dup of 1
        (3, " ".join(base + ["x", "y"])),       # near-dup of 2 (chain)
        (4, " ".join(f"z{i}" for i in range(40))),  # singleton
        (5, " ".join(f"q{i}" for i in range(40))),  # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.cluster_size: r for r in cluster_size_histogram(df).collect()}
    assert out[3].n_clusters == 1 and out[3].n_docs == 3
    assert out[1].n_clusters == 2 and out[1].n_docs == 2
    # histogram partitions the corpus exactly
    assert sum(r.n_docs for r in out.values()) == 5


def test_remove_duplicate_spans_replica(spark):
    """Span removal matches a from-scratch python replica: tokens under
    any cross-document 3-token window are cut, survivors stitched in
    order, fully-covered docs come back as ''."""
    docs = [
        (0, "p q r s t u v"),
        (1, "x y p q r s z"),   # shares window p q r / q r s with 0
        (2, "a b c"),           # clean
        (3, "p q r s"),         # fully covered by shared windows
        (4, None),
    ]
    k = 3
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    # python replica
    windows: dict[str, set[int]] = {}
    toks = {d: (t.split(" ") if t is not None else None) for d, t in docs}
    for d, tk in toks.items():
        if tk is None or len(tk) < k:
            continue
        for i in range(len(tk) - k + 1):
            windows.setdefault(" ".join(tk[i : i + k]), set()).add(d)
    shared = {w for w, ds in windows.items() if len(ds) >= 2}
    want = {}
    for d, tk in toks.items():
        if tk is None:
            want[d] = (0, 0, None)
            continue
        covered = set()
        for i in range(max(len(tk) - k + 1, 0)):
            if " ".join(tk[i : i + k]) in shared:
                covered.update(range(i, i + k))
        kept = [t for i, t in enumerate(tk) if i not in covered]
        want[d] = (len(tk), len(tk) - len(kept), " ".join(kept))
    from k8stream_spark.analytics import dedup as dd2

    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in dd2.remove_duplicate_spans(df, span_tokens=k).collect()
    }
    assert got == want
    assert got[2] == (3, 0, "a b c")      # clean doc untouched
    assert got[3][2] == ""                # fully covered -> empty audit row
    assert got[4] == (0, 0, None)         # NULL text passes through


def test_curation_pipeline_flag_consistency(spark, docs_df):
    """Composition invariants over the shared fixture: flags agree with
    the component operators, and final_keep is their conjunction."""
    from k8stream_spark.analytics import dedup as dd2
    from k8stream_spark.analytics import text as ta2

    out = {r.doc_id: r for r in dd2.curation_pipeline(docs_df).collect()}
    exact = {r.doc_id for r in dd2.exact_dedup(docs_df).collect()}
    keepl = {
        r.doc_id: r.kept
        for r in dd2.cluster_keep_longest(docs_df, threshold=0.8).collect()
    }
    qc = {
        r.doc_id: r.keep
        for r in ta2.quality_classifier_score(docs_df).collect()
    }
    assert set(out) == set(keepl)
    for d, r in out.items():
        assert r.is_exact_dup == (d not in exact)
        assert r.cluster_kept == keepl[d]
        assert r.quality_keep == qc[d]
        assert r.final_keep == (
            (not r.is_exact_dup) and r.cluster_kept and r.quality_keep
        )
    # docs 1 and 6 are identical text: exactly the higher id is exact-dup
    assert not out[1].is_exact_dup and out[6].is_exact_dup


def test_containment_pairs_planted(spark):
    """A short doc pasted verbatim inside a long one is caught even
    though symmetric Jaccard over the union is low; unrelated docs are
    not paired."""
    import random

    from k8stream_spark.analytics.dedup import containment_pairs

    rng = random.Random(7)
    words = "alpha bravo charlie delta echo foxtrot golf hotel".split()
    long_text = " ".join(rng.choice(words) for _ in range(400))
    short_text = long_text[50:130]          # substring -> contained
    other = " ".join(reversed(words)) * 12  # unrelated filler
    df = spark.createDataFrame(
        [(0, long_text), (1, short_text), (2, other)],
        "doc_id bigint, text string",
    )
    # max_df high: a 3-doc corpus would otherwise prune nothing anyway
    rows = containment_pairs(df, threshold_pct=80).collect()
    pairs = {(r.id_a, r.id_b) for r in rows}
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)
    r = next(r for r in rows if (r.id_a, r.id_b) == (0, 1))
    # the smaller side's fingerprints are (almost) all shared
    assert r.shared * 100 >= 80 * min(r.n_a, r.n_b)
    assert r.n_a > r.n_b  # doc 0 is the longer side


def test_containment_dedup_drops_contained_side(spark):
    """The fewer-fingerprint (contained) side drops with a pointer at
    its container; unrelated docs keep; every input doc appears."""
    import random

    from k8stream_spark.analytics.dedup import containment_dedup

    rng = random.Random(7)
    words = "alpha bravo charlie delta echo foxtrot golf hotel".split()
    long_text = " ".join(rng.choice(words) for _ in range(400))
    df = spark.createDataFrame(
        [
            (0, long_text),
            (1, long_text[50:130]),           # contained in 0
            (2, " ".join(reversed(words)) * 12),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in containment_dedup(df).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].kept and out[0].contained_in is None
    assert not out[1].kept and out[1].contained_in == 0
    assert out[2].kept


def test_containment_roots_resolve_chain_to_kept_doc(spark):
    """On a chain c ⊂ b ⊂ a the RAW contained_in pointer can name a
    dropped doc (c's min container is b, itself contained in a);
    containment_roots walks every pointer to a KEPT root.  Ids are laid
    out so the chain actually occurs: the long doc gets the LARGEST id,
    so min-container pointers land on intermediate (dropped) docs —
    also the case where CC min-label would resolve onto a dropped doc."""
    import random

    from k8stream_spark.analytics.dedup import (
        containment_dedup,
        containment_roots,
    )

    rng = random.Random(7)
    words = "alpha bravo charlie delta echo foxtrot golf hotel".split()
    long_text = " ".join(rng.choice(words) for _ in range(400))
    mid_text = long_text[30:230]
    short_text = long_text[50:130]  # substring of both mid and long
    df = spark.createDataFrame(
        [(0, short_text), (1, mid_text), (2, long_text)],
        "doc_id bigint, text string",
    )
    raw = {r.doc_id: r for r in containment_dedup(df).collect()}
    assert raw[2].kept
    assert not raw[1].kept and raw[1].contained_in == 2
    # the chain: doc 0's raw pointer names the DROPPED doc 1
    assert not raw[0].kept and raw[0].contained_in == 1

    out = {r.doc_id: r for r in containment_roots(df).collect()}
    assert set(out) == {0, 1, 2}
    assert out[2].kept and out[2].root_id == 2
    assert not out[1].kept and out[1].root_id == 2
    assert not out[0].kept and out[0].root_id == 2  # resolved past 1


def test_snapshot_delta_statuses(spark):
    """added / removed / changed classified by id + content hash;
    unchanged rows never appear in the output."""
    from k8stream_spark.analytics.dedup import snapshot_delta

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "x"), (4, "d")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r.status for r in snapshot_delta(old, new).collect()}
    assert out == {1: "removed", 3: "changed", 4: "added"}


def test_reembed_worklist_statuses_and_precedence(spark):
    """Worklist = added/changed churn + missing-embedding backfill;
    delta status wins over the backfill tag; removed and healthy
    unchanged docs never appear."""
    from k8stream_spark.analytics.dedup import reembed_worklist

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id bigint, text string"
    )
    # 1 removed, 2 unchanged (no embedding), 3 changed (has embedding),
    # 4 added (has embedding), 5 added (no embedding -> still 'added')
    new = spark.createDataFrame(
        [(2, "b"), (3, "x"), (4, "d"), (5, "e")],
        "doc_id bigint, text string",
    )
    emb = spark.createDataFrame(
        [(3, [1.0]), (4, [1.0])], "vec_id bigint, embedding array<float>"
    )
    out = {
        r.doc_id: r.status
        for r in reembed_worklist(old, new, emb).collect()
    }
    assert out == {
        2: "missing_embedding",
        3: "changed",
        4: "added",
        5: "added",
    }


def test_snapshot_delta_null_text_symmetry(spark):
    """A present doc with NULL text must hash like the streaming twin
    (md5 of empty bytes), not to NULL: NULL-vs-NULL would misread an
    unchanged null doc as changed churn every refresh."""
    from k8stream_spark.analytics.dedup import snapshot_delta

    old = spark.createDataFrame(
        [(1, None), (2, "x")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id bigint, text string"
    )
    out = {r.doc_id: r.status for r in snapshot_delta(old, new).collect()}
    # doc 1: null -> null is UNCHANGED (suppressed); doc 2: text -> null
    # is a real change.
    assert out == {2: "changed"}
