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
