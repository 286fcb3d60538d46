"""Text analysis + document dedup operators (the M6/LLM layer)."""

from __future__ import annotations

from k8stream_spark.analytics import dedup as dd
from k8stream_spark.analytics import text as ta


def test_token_count(docs_df):
    out = {r.doc_id: r.n_tokens for r in ta.token_count(docs_df).collect()}
    assert out[1] == 13
    assert out[7] == 1  # CJK: no spaces → one token


def test_term_stats(docs_df):
    out = {r.token: (r.tf, r.df) for r in ta.term_stats(docs_df).collect()}
    # 'the' appears 3x in docs 1/2/6 each (9 total), in 3 distinct docs
    assert out["the"] == (9, 3)


def test_lang_id(docs_df):
    out = {r.doc_id: r.lang_pred for r in ta.lang_id(docs_df).collect()}
    assert out[1] == "en"
    assert out[3] == "es"
    assert out[4] == "de"
    assert out[7] == "zh"  # CJK codepoint check
    assert out[5] in ("en", "und")  # neutral tech text


def test_quality_score_ranges(docs_df):
    for r in ta.quality_score(docs_df).collect():
        assert r.n_tokens >= 1
        assert 0 < r.distinct_ratio <= 1.0
        assert r.mean_token_len > 0


def test_fingerprint_collides_for_word_shuffles(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
        "doc_id bigint, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in ta.fingerprint(df).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_exact_dedup_groups_identical_texts(docs_df):
    out = {r.doc_id: r.n_copies for r in dd.exact_dedup(docs_df).collect()}
    assert out[1] == 2  # docs 1 and 6 identical → min doc_id 1, 2 copies
    assert 6 not in out


def test_minhash_lsh_finds_planted_near_dup(docs_df):
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in dd.minhash_lsh_pairs(docs_df, threshold=0.5).collect()}
    assert (1, 2) in pairs  # one-word difference
    assert (1, 6) in pairs and pairs[(1, 6)] == 1.0  # exact dup
    assert not any({a, b} == {1, 5} for a, b in pairs)


def test_ngram_jaccard_matches_minhash_verified_set(docs_df):
    lsh = {(r.doc_a, r.doc_b) for r in
           dd.minhash_lsh_pairs(docs_df, threshold=0.5).collect()}
    exact = {(r.doc_a, r.doc_b) for r in
             dd.ngram_jaccard_pairs(docs_df, threshold=0.5).collect()}
    assert lsh == exact


def test_minhash_recall_report_counters(docs_df):
    # Ground truth at 0.5 on the fixture: (1,2)/(2,6) near-dups +
    # (1,6) exact dup — the replayable banding twin must catch all
    # three (recall 1.0), and candidate generation must stay bucketed
    # (no all-pairs: docs 3/4/5/7 share no band with anything).
    row = dd.minhash_recall_report(docs_df, threshold=0.5).collect()[0]
    assert row.n_exact_pairs == 3
    assert row.n_caught == 3
    assert row.recall == 1.0
    assert row.n_band_candidates < 7 * 6 / 2  # bucketed, not all-pairs


def test_simhash_near_pairs(docs_df):
    sims = {r.doc_id: r.simhash for r in dd.simhash(docs_df).collect()}
    assert sims[1] == sims[6]  # identical text → identical simhash
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in dd.simhash_pairs(docs_df, max_hamming=8).collect()}
    assert pairs[(1, 6)] == 0
    assert (1, 2) in pairs  # near-dup within a few bits


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c d")],
                               "doc_id bigint, text string")
    out = {r.doc_id: r.s for r in
           df.select("doc_id", dd.word_shingles("text", 3).alias("s")).collect()}
    assert out[2] == ["a b c", "b c d"]
    # doc shorter than the shingle width yields no valid shingles
    assert all(" " in s for s in out[2])


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        [(1, "hello world42, don't!"), (2, "abc")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.n_bpe_tokens for r in ta.bpe_token_count(df).collect()}
    # hello | world | 42 | , | don | ' | t | !  → 8
    assert out[1] == 8
    assert out[2] == 1


def test_rolling_fingerprint_shift_invariance(spark):
    # A one-word edit at the END leaves the leading windows' fingerprints
    # intact — token-set fingerprints can't express that containment.
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = a[:-5] + "never"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, "xy")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in ta.rolling_fingerprint(df).collect()}
    assert rows[1].n_fingerprints > 0
    assert rows[1].min_fingerprint is not None
    # doc 3 shorter than k+w-1 → zero fingerprints, null min
    assert rows[3].n_fingerprints == 0
    assert rows[3].min_fingerprint is None


def test_rolling_fingerprint_overlap_for_near_dups(spark):
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = a.replace("bank", "bend")
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id bigint, text string")
    from k8stream_spark.analytics.text import rolling_fingerprint
    from pyspark.sql import functions as F

    fps = (
        rolling_fingerprint(df)
        .select("doc_id", "n_fingerprints")
        .collect()
    )
    # near-identical docs produce nearly equal fingerprint counts
    counts = {r.doc_id: r.n_fingerprints for r in fps}
    assert abs(counts[1] - counts[2]) <= 2


def test_redact_pii_replaces_and_counts(spark):
    from k8stream_spark.analytics.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org today"),
            (2, "call +1 (555) 010-4242 or 555 010 9999 now"),
            (3, "no pii here at all"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert rows[1].n_emails == 1 and "<EMAIL>" in rows[1].clean_text
    assert "bob.smith" not in rows[1].clean_text
    assert rows[2].n_phones == 2
    assert rows[2].clean_text.count("<PHONE>") == 2
    assert rows[3].n_emails == 0 and rows[3].n_phones == 0
    assert rows[3].clean_text == "no pii here at all"


def test_repetition_metrics_hand_computed(spark):
    from k8stream_spark.analytics.text import repetition_metrics

    df = spark.createDataFrame(
        [
            # "a a a b": top unigram a=3/4; bigrams [a a, a a, a b]:
            # top=2/3, dup=2/3
            (1, "a a a b"),
            # all distinct: top unigram 1/4; bigrams all unique: 1/3, 0
            (2, "w x y z"),
            # single token: no bigrams -> 0.0 by definition
            (3, "solo"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert rows[1].n_tokens == 4
    assert rows[1].top_unigram_frac == 0.75
    assert rows[1].top_bigram_frac == round(2 / 3, 6)
    assert rows[1].dup_bigram_frac == round(2 / 3, 6)
    assert rows[2].top_unigram_frac == 0.25
    assert rows[2].top_bigram_frac == round(1 / 3, 6)
    assert rows[2].dup_bigram_frac == 0.0
    assert rows[3].n_tokens == 1
    assert rows[3].top_bigram_frac == 0.0 and rows[3].dup_bigram_frac == 0.0


def test_source_mix_stats_exact_counts(spark):
    from k8stream_spark.analytics import text as textan

    docs = spark.createDataFrame(
        [
            (1, "a b c", "web"),
            (2, "a a a a", "web"),
            (3, "x y", "books"),
        ],
        "doc_id bigint, text string, source string",
    )
    rows = {r.source: r for r in textan.source_mix_stats(docs).collect()}
    web, books = rows["web"], rows["books"]
    assert (web.n_docs, web.n_tokens) == (2, 7)
    assert web.mean_doc_tokens == 3.5
    # distinct ratios: 3/3=1.0 and 1/4=0.25 → mean 0.625
    assert web.mean_distinct_ratio == 0.625
    assert (books.n_docs, books.n_tokens) == (1, 2)
    assert books.mean_distinct_ratio == 1.0


def test_c4_quality_filters_rules(spark):
    from k8stream_spark.analytics.text import c4_quality_filters

    docs = [
        # 30 medium words: passes everything
        (1, " ".join(["word"] * 30)),
        # too short
        (2, " ".join(["word"] * 10)),
        # mean word length < 4 (all 1-char words), and stopword flood
        (3, " ".join(["a"] * 40)),
        # one over-long word kills pass_max_word_len only
        (4, " ".join(["word"] * 39 + ["verylongword"])),
        # NULL text: coalesces to one empty segment, fails min_words
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r.doc_id: r for r in c4_quality_filters(df).collect()}
    assert out[1].keep
    assert not out[2].keep and not out[2].pass_min_words
    assert not out[3].keep
    assert not out[3].pass_mean_word_len and not out[3].pass_stopword_ratio
    assert not out[4].keep and not out[4].pass_max_word_len
    assert out[4].pass_min_words and out[4].pass_mean_word_len
    assert not out[5].keep and out[5].n_words == 1


def test_ngram_novelty_hand_case(spark):
    from k8stream_spark.analytics.text import ngram_novelty

    docs = [
        (1, "a b c d"),    # trigrams {a b c, b c d} — both novel
        (2, "a b c x"),    # {a b c, b c x} — 'a b c' first seen in doc 1
        (3, "z"),          # shorter than n: 0 / 0
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r.doc_id: r for r in ngram_novelty(df).collect()}
    assert (out[1].n_ngrams, out[1].n_novel) == (2, 2)
    assert (out[2].n_ngrams, out[2].n_novel) == (2, 1)
    assert (out[3].n_ngrams, out[3].n_novel) == (0, 0)


def test_corpus_top_ngrams_orders_by_doc_freq(spark):
    from k8stream_spark.analytics.text import corpus_top_ngrams

    docs = [
        (1, "x y z a b c"),
        (2, "x y z q r s"),
        (3, "x y z"),
        (4, "q r s t"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = corpus_top_ngrams(df, k=3).collect()
    assert [r.ngram for r in rows][0] == "x y z"
    assert rows[0].doc_freq == 3
    # deterministic lexicographic tiebreak among doc_freq=2
    assert rows[1].ngram == "q r s" and rows[1].doc_freq == 2


def test_gopher_quality_filters_rules(spark):
    df = spark.createDataFrame(
        [
            # passes everything (stops: the/and/have/with/be/to/of)
            (1, "the cat and dog have fun with toys be good to all of them"),
            # 3 words < min_words, and <2 required stops
            (2, "one two three"),
            # symbol flood (4/6 tokens) + alpha fraction 2/6
            (3, "# # # # the and"),
            # half the words are digit-only -> alpha fraction 5/10 < 80%
            (4, "12 34 56 78 90 the and of be to"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in ta.gopher_quality_filters(df, min_words=5).collect()}
    assert out[1].keep
    assert not out[2].pass_word_count and not out[2].pass_required_stops
    assert not out[3].pass_symbol_ratio and not out[3].pass_alpha_frac
    assert not out[4].pass_alpha_frac and out[4].pass_symbol_ratio
    assert not out[4].keep


def test_token_length_histogram_buckets(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 3)),
            (2, " ".join(["w"] * 33)),
            (3, " ".join(["w"] * 40)),
        ],
        "doc_id bigint, text string",
    )
    out = {r.bucket: r for r in ta.token_length_histogram(df).collect()}
    assert set(out) == {0, 1}
    assert (out[0].n_docs, out[0].n_tokens) == (1, 3)
    assert (out[1].n_docs, out[1].n_tokens) == (2, 73)
    assert (out[1].bucket_lo, out[1].bucket_hi) == (32, 63)


def test_chunk_overlap_covers_every_token(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "a b c")], "doc_id bigint, text string"
    )
    rows = ta.chunk_overlap(df, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 0,3,6 (ceil((10-4)/3)+1 = 3 windows), all length 4
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.start_token for r in c1] == [0, 3, 6]
    assert [r.n_chunk_tokens for r in c1] == [4, 4, 4]
    assert c1[0].chunk_text == "t0 t1 t2 t3"
    assert c1[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap at stride 3
    covered = {t for r in c1 for t in r.chunk_text.split(" ")}
    assert covered == {f"t{i}" for i in range(10)}
    # doc 2 fits one window -> exactly one (short) chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "a b c"


def test_dsir_importance_prefers_target_tokens(spark):
    df = spark.createDataFrame(
        [
            (1, "apple apple pie", "en"),
            (2, "apple tart", "en"),
            (3, "baguette fromage vin", "fr"),
        ],
        "doc_id bigint, text string, lang string",
    )
    out = {r.doc_id: r for r in ta.dsir_importance(df).collect()}
    assert out[1].n_tokens == 3 and out[3].n_tokens == 3
    # target-only tokens score positive, source-only tokens negative
    assert out[1].score > 0 > out[3].score
    assert out[1].score >= out[2].score


def test_quality_classifier_score_replica(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "alpha alpha")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in ta.quality_classifier_score(df).collect()}

    def w(tok):
        return int(hashlib.md5(f"qc-v1:{tok}".encode()).hexdigest()[:8], 16) % 100000 - 50000

    for i, txt in [(1, "alpha beta gamma"), (2, ""), (3, "alpha alpha")]:
        toks = txt.split(" ")
        assert out[i].score == sum(w(t) for t in toks)
        assert out[i].n_tokens == len(toks)
        assert out[i].keep == (out[i].score >= 0)


def test_source_lang_cube_subtotals_and_gid(spark):
    from k8stream_spark.analytics.text import source_lang_cube

    rows = [
        (1, "a b c", "en", "web"),
        (2, "d e", "en", "web"),
        (3, "f g h i", "fr", "web"),
        (4, "j", "en", "book"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    out = {
        (r.source, r.lang, r.gid): (r.n_docs, r.n_tokens)
        for r in source_lang_cube(df).collect()
    }
    # 2^2 grouping levels: detail, per-source, per-lang, grand total.
    assert out[("web", "en", 0)] == (2, 5)
    assert out[("web", None, 1)] == (3, 9)     # source subtotal
    assert out[(None, "en", 2)] == (3, 6)      # lang subtotal
    assert out[(None, None, 3)] == (4, 10)     # grand total
    # every (source, lang) detail cell present
    assert ("web", "fr", 0) in out and ("book", "en", 0) in out


def test_bpe_merge_pairs_replica(spark):
    """Top pair counts match a from-scratch python replica (count every
    adjacent char pair in every word occurrence) on a tiny corpus."""
    from collections import Counter

    from pyspark.sql import functions as F

    from k8stream_spark.analytics import text as textan

    docs = [
        (0, "low low lower"),
        (1, "newest widest low"),
        (2, None),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    counts = Counter()
    for _, t in docs:
        for w in (t or "").split(" "):
            if not w:
                continue
            for i in range(len(w) - 1):
                counts[w[i : i + 2]] += 1
    want = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    got = [
        (r.pair, r.pair_count)
        for r in textan.bpe_merge_pairs(df, k=20)
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .collect()
    ]
    assert got == want
    # 'lo' appears in low×3 + lower -> 4, the classic first BPE merge
    assert got[0][0] == "lo" and got[0][1] == 4


def test_bpe_apply_replica(spark):
    """BPE train+apply matches a from-scratch python replica of the
    same contract (greedy left-to-right merge, (count desc, pair asc)
    tiebreak), pinning the three behaviors the oracle relies on:
    greedy non-overlap on runs ('aaa' -> [aa, a]), merge priority by
    weighted count, and the early break when no pairs remain.

    Docs 4/5 pin the two anchored-merge regressions: 'xtab' must stay
    [x, ta, b] after merges (t,a) then (a,b) — an unanchored replace
    would match the 'a' suffix of symbol 'ta' and wrongly produce
    [x, tab] — and 'abab' must fully merge to [ab, ab] even though
    back-to-back anchored matches share a boundary separator
    (iterated passes)."""
    from collections import Counter

    from k8stream_spark.analytics import text as textan

    docs = [
        (0, "low low lower aaa"),
        (1, "newest widest low"),
        (2, None),
        (3, ""),
        (4, "ta ta ta ta ta ab ab ab xtab"),
        (5, "ab ab abab"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    def replica(n_merges):
        wf = Counter()
        for _, t in docs:
            if t is None:
                continue
            for w in t.split(" "):
                wf[w] += 1
        vocab = {w: [c for c in w] for w in wf}
        for _ in range(n_merges):
            pc = Counter()
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += wf[w]
            if not pc:
                break
            (a, b), _n = sorted(
                pc.items(),
                key=lambda kv: (-kv[1], kv[0][0] + "\x1f" + kv[0][1]),
            )[0]
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = out
        want = {}
        for d, t in docs:
            if t is None:
                want[d] = (0, 0)
            else:
                ws = t.split(" ")
                # the empty token ('' from splitting empty text) is 1
                # symbol in both engines: split('', SEP) == [''] —
                # the same artifact token_count carries
                want[d] = (
                    len(ws),
                    sum(len(vocab[w]) or 1 for w in ws),
                )
        return want

    for n_merges in (1, 3, 20):
        got = {
            r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
            for r in textan.bpe_apply(df, n_merges=n_merges).collect()
        }
        assert got == replica(n_merges), f"n_merges={n_merges}"
    # sanity: with enough merges the greedy-run word 'aaa' compresses
    # to 2 symbols ([aa, a]), never 1 in a single round over pair a|a
    one = {
        r.doc_id: r.n_bpe_tokens
        for r in textan.bpe_apply(df, n_merges=20).collect()
    }
    assert one[0] <= 6  # 'low low lower aaa' well below its 13 chars


def test_bigram_lm_score_replica(spark):
    """Per-doc mean bigram probability matches an integer-math python
    replica, including the short-doc zero rows."""
    from collections import Counter

    from k8stream_spark.analytics import text as textan

    docs = [
        (0, "a b a b a"),
        (1, "a b c"),
        (2, "x"),
        (3, None),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    c2: Counter = Counter()
    for _, t in docs:
        toks = (t or "").split(" ")
        if t is None or len(toks) < 2:
            continue
        for i in range(len(toks) - 1):
            c2[(toks[i], toks[i + 1])] += 1
    c1 = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    want = {}
    for did, t in docs:
        toks = (t or "").split(" ")
        if t is None or len(toks) < 2:
            want[did] = (0, 0)
            continue
        ms = [
            round(1000000.0 * c2[(toks[i], toks[i + 1])] / c1[toks[i]])
            for i in range(len(toks) - 1)
        ]
        want[did] = (len(ms), sum(ms) // len(ms))
    got = {
        r.doc_id: (r.n_bigrams, r.lm_micro)
        for r in textan.bigram_lm_score(df).collect()
    }
    assert got == want
    # doc 0 is pure common transitions -> scores above doc 1's mixed ones
    assert got[0][1] > got[1][1]


def test_cms_token_counts_replica(spark):
    """Sketch estimates match a from-scratch python Count-Min replica
    (same md5 recipe), never undercount, and equal truth when a token's
    row has no collision."""
    import hashlib
    from collections import Counter

    from k8stream_spark.analytics import text as textan

    docs = [
        (0, "a b c a"),
        (1, "b c d"),
        (2, None),
        (3, "a e"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    tf = Counter()
    for _, t in docs:
        if t is not None:
            tf.update(t.split(" "))
    depth, width = 4, 64
    buckets = {
        (j, tok): int(
            hashlib.md5(f"cms-v1:{j}:{tok}".encode()).hexdigest()[:8], 16
        ) % width
        for j in range(depth)
        for tok in tf
    }
    counters = Counter()
    for (j, tok), b in buckets.items():
        counters[(j, b)] += tf[tok]
    want = {
        tok: min(counters[(j, buckets[(j, tok)])] for j in range(depth))
        for tok in tf
    }
    got = {
        r.token: (r.tf_true, r.cms_est, r.overcount)
        for r in textan.cms_token_counts(df).collect()
    }
    assert set(got) == set(tf)
    for tok in tf:
        assert got[tok] == (tf[tok], want[tok], want[tok] - tf[tok]), tok
        assert got[tok][1] >= got[tok][0]  # never undercounts


def test_quality_yield_curve_replica(spark):
    """Bucketing, cumulative math and determinism match a python replica
    of the same hashed-linear score + ntile + cumulative pass."""
    import hashlib

    from k8stream_spark.analytics import text as textan

    docs = [(i, f"w{i % 5} w{(i + 1) % 7} common") for i in range(23)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    def weight(tok: str) -> int:
        return int(hashlib.md5(f"qc-v1:{tok}".encode()).hexdigest()[:8], 16) % 100000 - 50000

    scored = []
    for d, t in docs:
        toks = t.split(" ")
        scored.append((d, len(toks), sum(weight(w) for w in toks)))
    scored.sort(key=lambda r: (-r[2], r[0]))
    n, k = len(scored), 10
    # standard ntile: first n % k buckets get one extra row
    sizes = [(n // k) + (1 if b < n % k else 0) for b in range(k)]
    want, idx = {}, 0
    cum_docs = cum_tok = 0
    for b, sz in enumerate(sizes, start=1):
        rows = scored[idx : idx + sz]
        idx += sz
        nd, nt = len(rows), sum(r[1] for r in rows)
        cum_docs += nd
        cum_tok += nt
        want[b] = (nd, nt, min(r[2] for r in rows), cum_docs, cum_tok)
    got = {
        r.bucket: (r.n_docs, r.n_tokens, r.score_floor, r.cum_docs, r.cum_tokens)
        for r in textan.quality_yield_curve(df).collect()
    }
    assert got == want


def test_vocab_coverage_replica(spark):
    from collections import Counter

    from k8stream_spark.analytics import text as textan

    docs = [(0, "a a a b b c"), (1, "a b d"), (2, None)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    tf = Counter()
    for _, t in docs:
        if t is not None:
            tf.update(t.split(" "))
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(tf.values())
    cum = 0
    want = {}
    import math

    for i, (tok, c) in enumerate(ranked, start=1):
        cum += c
        if i in (1, 2, 5, 10, 20, 50):
            want[i] = (tok, c, cum, math.floor(1000000.0 * cum / total))
    got = {
        r.rank: (r.token, r.tf, r.cum_tf, r.coverage_ppm)
        for r in textan.vocab_coverage(df).collect()
    }
    assert got == want
    assert got[1][0] == "a" and got[1][3] == 444444  # 4/9 of the corpus
