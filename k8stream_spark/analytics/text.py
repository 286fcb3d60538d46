"""Text-analysis operators over the ``documents`` table: tokenization,
token counting, term statistics, language ID, quality scoring, document
fingerprinting.

Everything is built-in ``pyspark.sql.functions`` — split/explode/groupBy
stay JVM-side inside whole-stage codegen; no Python UDF touches the hot
path (a row-at-a-time Python tokenizer would be 10-100× slower and
serialize every string across the Py4J boundary).

Scale notes: ``term_stats`` shuffles once on the token (partial
aggregation map-side first); ``explode`` multiplies rows ~150× here, so
upstream filters/projections must run before it — callers should select
only (doc_id, text) into these functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from k8stream_spark.analytics import _cache

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately small and hard-pinned so the DuckDB oracle can repeat them.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "with"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "mit"),
    "es": ("el", "los", "las", "y", "con"),
}


def tokens(col: Column | str = "text") -> Column:
    """Whitespace tokenization (documents' text is space-separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokens per document — `size(split(text))`, zero Python."""
    return df.select(
        "doc_id", F.size(tokens(text_col)).cast("bigint").alias("n_tokens")
    )


def term_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus term statistics: total term frequency + document frequency
    per token.  One shuffle on the token with map-side partial agg.
    """
    exploded = df.select(
        "doc_id", F.explode(tokens(text_col)).alias("token")
    )
    return exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID via stopword-marker voting + a CJK codepoint check.

    CJK text (no spaces between han characters) is detected by regexp;
    otherwise the language with the most distinct marker hits wins, ties
    and zero-hit rows falling back to 'und'.  Pure expressions — the
    whole classifier is one projection.
    """
    toks = F.array_distinct(tokens(text_col))
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))
        )
        for lang, markers in LANG_MARKERS.items()
    }
    # Deterministic argmax: strictly-greater chain in fixed lang order.
    langs = list(LANG_MARKERS)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    is_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    pred = F.when(is_cjk, F.lit("zh")).otherwise(best_lang)
    return df.select("doc_id", pred.alias("lang_pred"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token count, distinct-token
    ratio, mean token length.  All ratios rounded to 4 dp so the oracle
    comparison is float-stable.
    """
    t = tokens(text_col)
    n_tok = F.size(t)
    n_distinct = F.size(F.array_distinct(t))
    return df.select(
        "doc_id",
        F.length(text_col).cast("bigint").alias("n_chars_m"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(n_distinct.cast("double") / n_tok, 4).alias("distinct_ratio"),
        F.round(
            (F.length(text_col) - n_tok + 1).cast("double") / n_tok, 4
        ).alias("mean_token_len"),
    )


# BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum glyph.
# Kept to constructs Java regex and RE2 (DuckDB) evaluate identically so
# the oracle can repeat it verbatim.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count under a BPE-style pre-tokenization regex (letter runs,
    digit runs, punctuation glyphs) — the LLM-pipeline estimate of prompt
    length, vs the whitespace count of ``token_count``.  regexp_extract_all
    is JVM-side; no Python."""
    return df.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))
        )
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 8, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03) on a
    rolling character window: hash every k-char gram, then keep the
    minimum hash of each window of w consecutive grams.  Near-identical
    documents share most fingerprints, enabling containment/plagiarism
    detection that token-set fingerprints miss.

    md5 (hex string; lexicographic min is consistent across engines) keeps
    the oracle repeatable — a production deployment would swap in xxhash64.
    Documents shorter than k+w-1 chars yield zero fingerprints.
    Output: (doc_id, n_fingerprints, min_fingerprint).
    """
    # Each stage is its own projection so the gram hashes are computed
    # exactly once (an inline ``grams`` expression inside the window lambda
    # would re-run every md5 per window element), and so short documents
    # never reach ``sequence`` with a negative stop.
    c = F.col(text_col)
    n_grams = F.length(c) - k + 1
    empty = F.array().cast("array<string>")
    gram_arr = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.md5(F.substring(c, i, k)),
    )
    from k8stream_spark.analytics.similarity import _spread

    # r15 opt: the per-doc gram/window transforms are this operator's
    # whole cost; a single-row-group local input would evaluate them on
    # one core.  _spread conditionally repartitions (no-op on
    # partitioned cluster input — see minhash_signature).
    df = _spread(df, "doc_id")
    g = df.select(
        "doc_id",
        F.when(n_grams >= w, gram_arr).otherwise(empty).alias("__g"),
    )
    win_arr = F.transform(
        F.sequence(F.lit(1), F.size(F.col("__g")) - w + 1),
        lambda j: F.array_min(F.slice(F.col("__g"), j, w)),
    )
    fp = g.select(
        "doc_id",
        F.when(F.size(F.col("__g")) >= w, F.array_distinct(win_arr))
        .otherwise(empty)
        .alias("__fp"),
    )
    return fp.select(
        "doc_id",
        F.size(F.col("__fp")).cast("bigint").alias("n_fingerprints"),
        F.array_min(F.col("__fp")).alias("min_fingerprint"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set — two docs that are word-shuffles of each other collide,
    which is exactly the canonicalization the near-dup pass wants as its
    cheap first stage.
    """
    canonical = F.array_join(
        F.array_sort(F.array_distinct(tokens(text_col))), " "
    )
    return df.select("doc_id", F.md5(canonical).alias("fingerprint"))


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
) -> DataFrame:
    """PII scrubbing — the training-data hygiene pass: replace email
    addresses and phone-number-shaped digit runs with placeholder tokens.
    Pure ``regexp_replace`` chain — JVM-side, whole-stage codegen, no
    Python; the patterns are RE2-compatible so the DuckDB oracle runs
    the identical regexes.  Returns (doc_id, clean_text, n_emails,
    n_phones) so the redaction is auditable, not silent.
    """
    c = F.col(text_col)
    # group 0 = whole match (the patterns define no capture groups)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
    no_email = F.regexp_replace(c, EMAIL_RE, email_token)
    n_phones = F.size(
        F.regexp_extract_all(no_email, F.lit(PHONE_RE), F.lit(0))
    )
    clean = F.regexp_replace(no_email, PHONE_RE, phone_token)
    return df.select(
        "doc_id",
        clean.alias("clean_text"),
        n_emails.cast("bigint").alias("n_emails"),
        n_phones.cast("bigint").alias("n_phones"),
    )


def rare_token_ratio(
    df: DataFrame, text_col: str = "text", rare_max_count: int = 2
) -> DataFrame:
    """Corpus-statistics quality signal (the two-pass CCNet-style shape):
    pass 1 aggregates corpus-wide token counts; pass 2 scores each doc by
    its fraction of rare tokens (corpus count <= ``rare_max_count``) —
    high ratios flag noisy/garbled documents.

    All integer counting until the final ratio, so the oracle comparison
    is exact (a mean-log-prob variant would sum doubles in engine-
    dependent order).  Shuffles: one groupBy on token for the stats, one
    token-keyed join for scoring, one groupBy doc_id — all (token/doc,
    count) rows.
    """
    tok = df.select(
        "doc_id", F.explode(tokens(text_col)).alias("token")
    )
    freqs = tok.groupBy("token").agg(F.count(F.lit(1)).alias("__cf"))
    scored = tok.join(freqs, "token")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__cf") <= rare_max_count, 1).otherwise(0)
            ).alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_rare",
            F.round(
                F.col("n_rare").cast("double") / F.col("n_tokens"), 4
            ).alias("rare_ratio"),
        )
    )


def top_terms_per_doc(
    df: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k distinctive terms per document by tf·idf ordering — the
    keyword-extraction pass.  Score = tf_doc / df_corpus (rank-equivalent
    to tf·idf for a fixed corpus); both factors are exact integers and
    the single division produces bit-identical doubles on any engine, so
    the ranking (ties broken by token) is oracle-exact — no aggregated
    floats anywhere.

    Shuffles: token groupBy for document frequencies, (doc, token)
    groupBy for tf, one token-keyed join, and the per-doc ranking window
    — all (id, count) rows.
    """
    from k8stream_spark.analytics.similarity import _spread

    # _spread (guide §2.5, r15): tokenization runs once per consumer
    # branch (tf and df below) and on one core for single-row-group
    # local input.  No-op on partitioned input.
    tok = _spread(df, "doc_id").select(
        "doc_id", F.explode(tokens(text_col)).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tok.select("doc_id", "token").distinct().groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(dfreq, "token").withColumn(
        "score",
        F.round(F.col("tf").cast("double") / F.col("df"), 6),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals — the filter rules
    (Rae et al. 2021, §A1.1) that catch boilerplate and degenerate
    generations before training:

    * ``top_unigram_frac`` — share of tokens taken by the single most
      frequent token;
    * ``top_bigram_frac`` — share of bigram occurrences taken by the most
      frequent bigram;
    * ``dup_bigram_frac`` — share of bigram occurrences whose bigram
      appears more than once in the document.

    All ratios are exact-integer counts with one final division, so the
    oracle reproduces them bit-for-bit.  Shape: explode to (doc, gram)
    rows, count per gram, aggregate per doc — two shuffles keyed by
    doc_id (+gram), partial aggregation map-side, nothing but ids and
    counts on the wire.  Single-token docs have no bigrams: their bigram
    fractions are 0.0 by definition here (not null) so downstream
    filters need no special case.
    """
    tk = tokens(text_col)
    base = df.select("doc_id", tk.alias("__tk"))
    uni = (
        base.select("doc_id", F.explode(F.col("__tk")).alias("__g"))
        .groupBy("doc_id", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("doc_id")
        .agg(
            F.sum("__c").alias("__n"),
            F.max("__c").alias("__top"),
        )
        .select(
            "doc_id",
            F.col("__n").cast("bigint").alias("n_tokens"),
            F.round(F.col("__top").cast("double") / F.col("__n"), 6).alias(
                "top_unigram_frac"
            ),
        )
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("__tk")) - 1),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("__tk"), i),
            F.element_at(F.col("__tk"), i + 1),
        ),
    )
    bi = (
        base.where(F.size(F.col("__tk")) >= 2)
        .select("doc_id", F.explode(bigrams).alias("__g"))
        .groupBy("doc_id", "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("doc_id")
        .agg(
            F.sum("__c").alias("__n"),
            F.max("__c").alias("__top"),
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias(
                "__dup"
            ),
        )
        .select(
            "doc_id",
            F.round(F.col("__top").cast("double") / F.col("__n"), 6).alias(
                "top_bigram_frac"
            ),
            F.round(F.col("__dup").cast("double") / F.col("__n"), 6).alias(
                "dup_bigram_frac"
            ),
        )
    )
    return (
        uni.join(bi, "doc_id", "left")
        .na.fill({"top_bigram_frac": 0.0, "dup_bigram_frac": 0.0})
        .select(
            "doc_id",
            "n_tokens",
            "top_unigram_frac",
            "top_bigram_frac",
            "dup_bigram_frac",
        )
    )


def c4_quality_filters(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 30,
    min_mean_len_x1: int = 4,
    max_mean_len_x1: int = 10,
    stopword_pct: int = 10,
    max_word_len: int = 7,
) -> DataFrame:
    """C4/Gopher-style rule-based quality filtering with named per-rule
    flags — the pre-training corpus cleaning pass (Raffel et al. 2020 §2.2;
    Rae et al. 2021 A1.1): short docs, degenerate word-length profiles,
    stopword floods, and over-long tokens are dropped before training.
    Thresholds are scaled to the synthetic corpus (real C4/Gopher uses
    e.g. max word length 1000); each rule is a parameter.

    Every rule is EXACT INTEGER arithmetic — counts and cross-multiplied
    ratio bounds (``3·n_words <= n_chars`` instead of a float mean), so
    there is no float boundary anywhere and any engine agrees bit-for-bit.

    Emits one row per doc with each rule's pass flag and the combined
    ``keep``; keeping flags (not just survivors) is what a pipeline
    audits — which rule kills how much of which source.

    One projection pass, zero shuffles, zero Python: split/filter/
    transform/aggregate stay in whole-stage codegen.
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n_words = F.size(toks).cast("bigint")
    n_chars = F.length(
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), " ", "")
    ).cast("bigint")
    n_stop = F.size(
        F.filter(toks, lambda w: w.isin("a", "the"))
    ).cast("bigint")
    longest = F.array_max(F.transform(toks, F.length)).cast("bigint")
    f_min_words = n_words >= min_words
    f_mean_len = (min_mean_len_x1 * n_words <= n_chars) & (
        n_chars <= max_mean_len_x1 * n_words
    )
    f_stopwords = 100 * n_stop < stopword_pct * n_words
    f_max_word = longest <= max_word_len
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        f_min_words.alias("pass_min_words"),
        f_mean_len.alias("pass_mean_word_len"),
        f_stopwords.alias("pass_stopword_ratio"),
        f_max_word.alias("pass_max_word_len"),
        (f_min_words & f_mean_len & f_stopwords & f_max_word).alias("keep"),
    )


def source_mix_stats(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source corpus composition: doc count, total tokens, mean doc
    length, mean distinct-token ratio — the numbers a data-mixing stage
    weighs domains by (how much of each source, how diverse it is)
    before sampling a training blend.

    One groupBy on the source key with map-side partial aggregation;
    token counts are exact integers, and the ratio mean goes through the
    exact-decimal sum (a plain double ``avg`` depends on accumulation
    order and would flap against the oracle at high parallelism).

    The 4-dp means are rounded in EXACT integer space, never on a double
    quotient: ``round(S/n, 4)`` for a sum S stored exactly at scale p is
    ``floor((2·S·10^(4+p)·10^-p + n·10^p·10^-p)/(2·n)) / 10^4``, i.e.
    with ``s_int = S·10^p`` an integer,

        q = (2·s_int·10^4 + n·10^p) div (2·n·10^p);  mean = q / 10^4

    — all products exact DECIMAL(38,0), ``div`` is exact integral
    division in Spark and ``//`` floor division on HUGEINT in DuckDB,
    and the final ``q/10^4`` is one correctly-rounded IEEE op both
    engines share.  Rounding the double quotient instead (the r5 bug)
    flaps at tie boundaries: Spark's ``F.round`` goes through the
    shortest-decimal string of the double while DuckDB rounds the binary
    value, so a mean landing on …X5 can round differently."""
    t = tokens(text_col)
    n_tok = F.size(t)
    ratio = F.size(F.array_distinct(t)).cast("double") / n_tok
    agg = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok.cast("bigint")).alias("n_tokens"),
        F.sum(ratio.cast("decimal(30,8)")).alias("__rsum"),
    )
    # p=0 (integer token sum) and p=8 (decimal(·,8) ratio sum) instances
    # of the formula above; quotients are mean·10^4, far inside bigint.
    mean_doc_tokens = F.expr(
        "CAST((CAST(n_tokens AS DECIMAL(38,0)) * 20000 + n_docs)"
        " div (CAST(n_docs AS DECIMAL(38,0)) * 2) AS DOUBLE) / 10000"
    )
    mean_distinct_ratio = F.expr(
        "CAST((CAST(__rsum * 100000000 AS DECIMAL(38,0)) * 20000"
        "      + CAST(n_docs AS DECIMAL(38,0)) * 100000000)"
        " div (CAST(n_docs AS DECIMAL(38,0)) * 200000000) AS DOUBLE)"
        " / 10000"
    )
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        mean_doc_tokens.alias("mean_doc_tokens"),
        mean_distinct_ratio.alias("mean_distinct_ratio"),
    )


def ngram_novelty(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-document n-gram novelty — the curation signal behind
    "how much NEW content does this doc add": for each doc, how many of
    its distinct n-grams appear in NO earlier document (doc_id order is
    the arrival order).  Crawl pipelines rank/retain by novelty to avoid
    paying training compute for the long tail of recombined content.

    Output (all exact integers, no rounding anywhere): ``doc_id``,
    ``n_ngrams`` (distinct n-grams in the doc), ``n_novel`` (those whose
    earliest corpus occurrence is this doc).  Docs shorter than ``n``
    tokens have 0/0.

    Scale posture: the same inverted-index shape as the n-gram Jaccard
    verifier — explode distinct n-grams, ONE hash-groupBy on the n-gram
    computing min(doc_id) (map-side partial min), one equi-join back on
    the n-gram, one count per doc.  Shuffles carry (ngram-hash, id)
    pairs; nothing is ever all-pairs.
    """
    toks = tokens(text_col)
    # Guard short docs: Spark sequence(1, 0) DESCENDS ([1, 0]) and slice
    # rejects start 0, so docs with < n tokens must short-circuit to an
    # empty gram set (same pattern as rolling_fingerprint).
    gram_arr = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    grams = F.array_distinct(
        F.when(F.size(toks) >= n, gram_arr).otherwise(
            F.array().cast("array<string>")
        )
    )
    from k8stream_spark.analytics.similarity import _spread

    # _spread (guide §2.5, r15): the tokenize+slice+join gram transform
    # is this operator's stage-1 cost; single-row-group local input
    # would evaluate it on one core.  No-op on partitioned input.
    ex = _spread(df, "doc_id").select("doc_id", F.explode(grams).alias("__g"))
    first_seen = ex.groupBy("__g").agg(F.min("doc_id").alias("__first"))
    per_doc = (
        ex.join(first_seen, "__g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                (F.col("doc_id") == F.col("__first")).cast("bigint")
            ).alias("n_novel"),
        )
    )
    return (
        df.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .na.fill({"n_ngrams": 0, "n_novel": 0})
    )


def corpus_top_ngrams(
    df: DataFrame, text_col: str = "text", n: int = 3, k: int = 20
) -> DataFrame:
    """Corpus-wide top-k most frequent n-grams (by document frequency,
    ties broken lexicographically) — the summary statistic every corpus
    audit starts from, and the seed list for boilerplate/template
    detection (the df-threshold kill list of ``remove_boilerplate`` is
    this table's head).

    Exact counts, deterministic tiebreak.  One explode + hash-groupBy on
    the n-gram, then a global top-k — which Catalyst executes as
    TakeOrderedAndProject (per-partition heaps + merge), never a global
    sort of the n-gram table.
    """
    toks = tokens(text_col)
    gram_arr = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    # Same short-doc guard as ngram_novelty (sequence descends past 0).
    grams = F.array_distinct(
        F.when(F.size(toks) >= n, gram_arr).otherwise(
            F.array().cast("array<string>")
        )
    )
    from k8stream_spark.analytics.similarity import _spread

    # _spread (guide §2.5, r15): same stage-1 seam as ngram_novelty.
    return (
        _spread(df, "doc_id").select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("ngram").asc())
        .limit(k)
    )


# Gopher's "must contain 2 of ..." required-stopword set (Rae et al. 2021
# A1.1).  Hard-pinned so the DuckDB oracle can repeat it verbatim.
GOPHER_REQUIRED_STOPS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_filters(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 40,
    max_words: int = 100_000,
    alpha_frac_pct: int = 80,
    symbol_pct: int = 10,
    min_required_stops: int = 2,
) -> DataFrame:
    """Gopher-style repetition-independent quality rules (Rae et al. 2021
    A1.1) — the second standard rule family next to ``c4_quality_filters``
    (C4 §2.2).  Where C4 checks word-length profiles and stopword floods,
    Gopher checks word-count bounds, the fraction of words containing an
    alphabetic character, the symbol-to-word ratio (``#`` / ``...``), and
    that at least ``min_required_stops`` of a fixed 8-stopword set occur.
    Thresholds are scaled to the synthetic corpus; each is a parameter.

    Like the C4 twin, every rule is EXACT INTEGER arithmetic — counts and
    cross-multiplied ratio bounds (``100·n_alpha >= 80·n_words`` instead
    of a float fraction), so any engine agrees bit-for-bit.

    Emits per-rule pass flags plus combined ``keep`` (audit shape: which
    rule kills how much).  One projection, zero shuffles, zero Python —
    the array filters/intersections run inside whole-stage codegen.
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n_words = F.size(toks).cast("bigint")
    n_alpha = F.size(
        F.filter(toks, lambda w: w.rlike("[A-Za-z]"))
    ).cast("bigint")
    n_sym = F.size(
        F.filter(toks, lambda w: w.contains("#") | w.contains("..."))
    ).cast("bigint")
    n_req = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPS]),
        )
    ).cast("bigint")
    f_words = (n_words >= min_words) & (n_words <= max_words)
    f_alpha = 100 * n_alpha >= alpha_frac_pct * n_words
    f_symbol = 100 * n_sym <= symbol_pct * n_words
    f_stops = n_req >= min_required_stops
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        f_words.alias("pass_word_count"),
        f_alpha.alias("pass_alpha_frac"),
        f_symbol.alias("pass_symbol_ratio"),
        f_stops.alias("pass_required_stops"),
        (f_words & f_alpha & f_symbol & f_stops).alias("keep"),
    )


def token_length_histogram(
    df: DataFrame, text_col: str = "text", bucket_width: int = 32
) -> DataFrame:
    """Corpus token-length histogram: docs and tokens per fixed-width
    length bucket — the packing/truncation diagnostic a training pipeline
    reads before choosing a sequence length (what fraction of docs
    truncate at 2k?  how much padding at 512?).

    ``bucket_width`` must be a power of two: the bucket index is then an
    exactly-representable IEEE division (denominator 2^k), so the
    truncating cast is engine-exact with no integer-div dialect issues.

    One hash-groupBy on the bucket index with map-side partial agg —
    cardinality is ~(max_len / width), tiny at any corpus scale.
    """
    if bucket_width & (bucket_width - 1):
        raise ValueError("bucket_width must be a power of two")
    n_tok = F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
    bucket = (n_tok / F.lit(bucket_width)).cast("bigint")
    return (
        df.select(bucket.alias("bucket"), n_tok.cast("bigint").alias("__n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("n_tokens"),
        )
        .select(
            "bucket",
            (F.col("bucket") * bucket_width).alias("bucket_lo"),
            (F.col("bucket") * bucket_width + bucket_width - 1).alias(
                "bucket_hi"
            ),
            "n_docs",
            "n_tokens",
        )
    )


def chunk_overlap(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG / context-window
    splitter: each document becomes ⌈(n−chunk)/stride⌉+1 windows of up to
    ``chunk_tokens`` tokens starting every ``stride`` tokens (so adjacent
    chunks share ``chunk_tokens − stride`` tokens of overlap).  Documents
    at or under one window emit exactly one chunk; the final window is
    allowed to run short rather than re-anchor at the tail, so every
    token appears in ≥1 chunk and chunk starts are a pure function of the
    index (stable across runs and engines).

    Row-multiplying like ``explode`` (~n/stride×), so project down to
    (id, text) first.  The expansion itself is ``posexplode(sequence)``
    + ``slice`` — per-row array ops in whole-stage codegen, zero Python
    and zero shuffles; the chunk count per row is data-derived, never a
    driver-side loop.
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(toks)
    # Integer ceil-div via exactly-representable double ops: n, chunk and
    # stride are small integers, and floor((a + b - 1)/b) of correctly-
    # rounded IEEE division is the exact integer quotient.
    n_starts = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / F.lit(stride)) + 1
    )
    staged = df.select(
        "doc_id",
        toks.alias("__t"),
        F.posexplode(F.sequence(F.lit(0), n_starts.cast("int") - 1)).alias(
            "__pos", "__i"
        ),
    )
    start = F.col("__i").cast("bigint") * stride
    chunk_arr = F.slice(F.col("__t"), F.col("__i") * stride + 1, chunk_tokens)
    return staged.select(
        "doc_id",
        F.col("__i").cast("bigint").alias("chunk_id"),
        start.alias("start_token"),
        F.size(chunk_arr).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(chunk_arr, " ").alias("chunk_text"),
    )


def dsir_importance(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    target_lang: str = "en",
    n_buckets: int = 1024,
) -> DataFrame:
    """Data-selection importance score over hashed unigram features — the
    DSIR shape (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): documents are scored by how target-like
    their hashed-token distribution is, here with the ``lang ==
    target_lang`` slice as the target and the whole corpus as the source.

    Instead of DSIR's float log-likelihood ratio ``Σ log(p_b/q_b)`` (libm
    ``log`` is not bit-identical across engines), the score is the exact
    linear statistic ``Σ_tokens (p_b·Q − q_b·P)`` — positive when the
    doc's buckets are over-represented in the target — computed entirely
    in integer space (DECIMAL(38,0) / HUGEINT) and cast to double once at
    the end (a single correctly-rounded op both engines share).  Ranking
    by it selects the same documents as ranking by the per-token mean of
    the probability difference ``p_b/P − q_b/Q``.

    Bucket = first 32 md5 bits of ``dsir-v1:token`` mod ``n_buckets``
    (the repo's engine-portable hash).  Scale shape: one explode +
    hash-groupBy on (doc, bucket), bucket stats and the two totals are
    tiny broadcast sides (≤ ``n_buckets`` rows / 1 row), so the only
    data-sized shuffles are the two partial-aggregated groupBys.  Exact
    up to ~10^13 tokens per corpus slice (factors cast to DECIMAL(19,0),
    products bounded by 10^32 < 10^38).
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    from k8stream_spark.analytics.similarity import _spread

    # _spread (guide §2.5, r15): the split+explode+md5-bucket stage-1 is
    # the corpus-sized work; single-row-group local input would run it
    # on one core.  No-op on partitioned input.
    ex = _spread(df, "doc_id").select(
        "doc_id",
        # when/otherwise, not ==.cast: a NULL lang must count as source-
        # only (0), and (NULL == x) casts to NULL which sum would skip.
        F.when(F.col(lang_col) == target_lang, F.lit(1))
        .otherwise(F.lit(0))
        .alias("__is_t"),
        F.explode(toks).alias("__tok"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsir-v1:"), F.col("__tok"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % n_buckets
    )
    tok = ex.select("doc_id", "__is_t", bucket.alias("__b"))
    # Aggregate the token stream ONCE: per-doc-bucket counts are the
    # finest grain every later quantity needs, so bucket stats and the
    # corpus totals both roll up from this already-reduced frame —
    # leaving exactly one data-sized shuffle (the (doc, bucket) groupBy
    # with map-side partial agg); the stats/totals shuffles carry the
    # ~docs·distinct-buckets frame, and the corpus scan runs once.
    # (__is_t is constant per doc, so adding it to the key changes
    # nothing about the grain.)  The frame feeds BOTH the stats rollup
    # and the final score join; without the persist Catalyst plans the
    # explode+groupBy twice (two corpus scans), with it both branches
    # read one InMemoryRelation computed once — persisting the REDUCED
    # frame (~docs·distinct-buckets rows), never the token stream.
    per_doc_bucket = tok.groupBy("doc_id", "__is_t", "__b").agg(
        F.count(F.lit(1)).alias("__c")
    ).persist()
    stats = per_doc_bucket.groupBy("__b").agg(
        F.sum(F.col("__c") * F.col("__is_t")).alias("__p"),
        F.sum("__c").alias("__q"),
    )
    # __tp/__tq, not __P/__Q: Spark resolution is case-insensitive by
    # default, so __P would collide with the per-bucket __p after the join.
    totals = stats.agg(
        F.sum("__p").alias("__tp"), F.sum("__q").alias("__tq")
    )
    d19 = "decimal(19,0)"
    delta = F.col("__p").cast(d19) * F.col("__tq").cast(d19) - F.col(
        "__q"
    ).cast(d19) * F.col("__tp").cast(d19)
    return (
        per_doc_bucket.join(F.broadcast(stats), "__b")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.sum(F.col("__c").cast(d19) * delta)
            .cast("double")
            .alias("score"),
        )
    )


def quality_classifier_score(
    df: DataFrame,
    text_col: str = "text",
    seed: str = "qc-v1",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """fastText-shaped linear quality classifier over hashed
    bag-of-words features — the engine side of model-based quality
    filtering (Joulin et al. 2016; the CCNet/LLaMA corpus pipelines
    score documents with exactly this architecture).  Each token hashes
    to a deterministic signed integer weight (first 32 md5 bits of
    ``seed:token``, mapped to [-50000, 49999]); the document score is
    the weight sum and ``keep`` its sign.  The pinned md5 weights stand
    in for a trained model's — swapping in real weights changes a lookup
    table, not the plan — while keeping the whole operator
    oracle-checkable.

    ZERO shuffles: the hash, the per-element transform and the bigint
    fold all run inside the row projection, so scoring a 100 TB corpus
    is a single scan with no exchange at all.  Exact at any scale:
    |score| ≤ 5e4·n_tokens stays far inside int64.

    ``passthrough`` carries extra input columns (typically the text)
    into the output, so a gate-then-process pipeline — batch OR
    streaming, where a re-join would need watermarks — stays a single
    stateless projection.
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    weight = lambda t: (  # noqa: E731
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + ":"), t)), 1, 8), 16, 10
        ).cast("bigint")
        % 100000
        - 50000
    )
    score = F.aggregate(
        F.transform(toks, weight),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return df.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        score.alias("score"),
        (score >= 0).alias("keep"),
        *passthrough,
    )


def bpe_merge_pairs(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Top-k most frequent adjacent character pairs — the counting step of
    one BPE tokenizer-training iteration (Sennrich et al. 2016): the pair
    with the highest corpus frequency is the next merge rule.  Repeated
    invocations against a growing merge table would train the full
    tokenizer; this operator is the per-iteration corpus statistic, the
    part that actually touches 100 TB.

    Scale posture is the BPE trick itself: collapse the corpus to the
    WORD-FREQUENCY table first (one hash-groupBy — corpus-sized shuffle
    of (word, 1) pairs with map-side combine), then run the char-level
    pair explode over the vocab-sized frame only.  Pair counting over
    words-with-weights touches |vocab| rows regardless of corpus size,
    so the expensive explode never multiplies corpus rows.  The final
    top-k is TakeOrderedAndProject (per-partition heaps), never a global
    sort.  All counts exact integers.
    """
    toks = tokens(text_col)
    word_freq = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(toks).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__wf"))
    )
    # sequence(1, len-1) descends when len < 2 — same short-word guard as
    # ngram_novelty's short-doc guard.
    pair_arr = F.transform(
        F.sequence(F.lit(1), F.length("__w") - 1),
        lambda i: F.substring(F.col("__w"), i, 2),
    )
    pairs = F.when(F.length("__w") >= 2, pair_arr).otherwise(
        F.array().cast("array<string>")
    )
    return (
        word_freq.select(F.explode(pairs).alias("pair"), "__wf")
        .groupBy("pair")
        .agg(F.sum("__wf").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(k)
    )


#: Symbol separator inside a BPE word-state string: U+001F (unit
#: separator), chosen because it cannot appear inside a whitespace
#: token of the documents corpus.  String form keeps the per-round
#: merge a single codegen ``replace`` whose left-to-right
#: non-overlapping semantics (identical in Spark and DuckDB) ARE the
#: greedy BPE scan — no array fold, no UDF.
_BPE_SEP = "\x1f"
#: Anchored-merge passes per BPE round: the sep-anchored replace
#: consumes the boundary separator, so chained occurrences of the same
#: pair within one word ([A,B,A,B,...]) merge one-per-chain per pass;
#: 8 passes reach the greedy fixpoint for runs of up to 2^8 pair
#: occurrences (a 512-symbol single-word run — degenerate input).
_BPE_MERGE_PASSES = 8


def bpe_apply(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """Train ``n_merges`` BPE merge rules and APPLY them — the full
    tokenizer round-trip (Sennrich et al. 2016) whose counting step is
    ``bpe_merge_pairs``.  Training and application coincide on the
    corpus: after N rounds of merging the currently-most-frequent
    adjacent symbol pair into the vocab's symbol sequences, each
    word's final sequence IS its BPE tokenization under the learned
    rules, and the per-document token count is a vocab join away.
    This is the operator a training-data pipeline runs on every
    document (token budgeting / packing under a real tokenizer, not
    the whitespace approximation of ``token_count``).

    Per-document output: ``n_ws_tokens`` (whitespace tokens, the
    pre-BPE count) and ``n_bpe_tokens`` (symbols after the learned
    merges — between n_chars and n_ws_tokens, monotonically falling as
    n_merges grows).  Exact integers end to end.

    Scale posture — the BPE trick, now for the whole loop: the corpus
    collapses to the word-frequency table ONCE (the only corpus-sized
    shuffle besides the final count join), then every training round
    is vocab-sized: explode adjacent symbol pairs (weighted by word
    frequency), pick the argmax with a deterministic (count desc,
    pair asc) tiebreak via TakeOrderedAndProject, and apply the merge
    as one codegen ``replace`` over the vocab's symbol strings.  State
    per round is the vocab frame (localCheckpoint-truncated lineage,
    the connected-components discipline); the driver sees ONE
    (pair, count) row per round, never data.  At 100 TB the vocab is
    ~10⁶ rows however big the corpus — rounds cost seconds, and the
    final (word → n_sym) join is broadcastable.

    Deterministic and oracle-replayable: pair counts are exact
    integers, the tiebreak is a bytewise string compare, and the
    greedy left-to-right merge is ``replace``'s documented semantics
    in both engines — the DuckDB oracle replays the same N rounds
    unrolled.  A round with no remaining pairs (every word a single
    symbol) stops training early; the oracle's corresponding rounds
    no-op on an impossible pattern, so both engines agree at any
    n_merges.

    Iterative (driver-side training loop): excluded from the plan
    gate like the CC fixpoints; the returned frame's plan is the
    final count join.
    """
    from k8stream_spark.analytics._cache import finalize

    chars = lambda c: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.substring(c, i, 1),
    )
    word_freq = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__wf"))
    )
    vocab = word_freq.select(
        "__w",
        "__wf",
        F.when(
            F.length("__w") > 0, F.concat_ws(_BPE_SEP, chars(F.col("__w")))
        )
        .otherwise(F.lit(""))
        .alias("__s"),
    ).localCheckpoint(eager=True)

    for _ in range(n_merges):
        arr = F.split(F.col("__s"), _BPE_SEP)
        pair_arr = F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.concat(
                F.element_at(arr, i),
                F.lit(_BPE_SEP),
                F.element_at(arr, i + F.lit(1)),
            ),
        )
        pairs = F.when(F.size(arr) >= 2, pair_arr).otherwise(
            F.array().cast("array<string>")
        )
        top_df = (
            vocab.select(F.explode(pairs).alias("__p"), "__wf")
            .groupBy("__p")
            .agg(F.sum("__wf").alias("__c"))
            .orderBy(F.col("__c").desc(), F.col("__p").asc())
            .limit(1)
        )
        top = top_df.collect()
        _cache.capture_iteration_plan("bpe_train.pair_count", top_df)
        if not top:
            break
        merged_pair = top[0]["__p"]
        # Separator-ANCHORED merge: a bare replace("A<sep>B") also
        # matches where A is a suffix of a longer symbol (symbols
        # [x, ta, b] with pair (a,b) would wrongly produce [x, tab]),
        # so the pattern is wrapped "<sep>A<sep>B<sep>" against a
        # sep-wrapped state string.  The anchored match CONSUMES the
        # shared boundary separator, so back-to-back occurrences
        # (runs like [A,B,A,B]) need iterated passes: each pass
        # merges the leftmost of any adjacent occurrence chain and
        # halves the rest — _BPE_MERGE_PASSES=8 covers runs of 2^8
        # pair occurrences per word, and the fixpoint equals the
        # symbol-wise greedy left-to-right merge the replica test
        # pins.  Each pass is one codegen string op on the
        # vocab-sized frame.
        anchored = F.lit(_BPE_SEP + merged_pair + _BPE_SEP)
        collapsed = F.lit(
            _BPE_SEP + merged_pair.replace(_BPE_SEP, "") + _BPE_SEP
        )
        s = F.concat(F.lit(_BPE_SEP), F.col("__s"), F.lit(_BPE_SEP))
        for _pass in range(_BPE_MERGE_PASSES):
            s = F.replace(s, anchored, collapsed)
        s = s.substr(F.lit(2), F.length(s) - 2)
        nxt_lazy = vocab.select(
            "__w",
            "__wf",
            s.alias("__s"),
        )
        nxt = nxt_lazy.localCheckpoint(eager=True)
        _cache.capture_iteration_plan("bpe_train.merge_apply", nxt_lazy)
        # No explicit release: localCheckpointed frames have no
        # CacheManager entry (unpersist would be a no-op) — dropping
        # the reference lets ContextCleaner reap the round's blocks
        # after a driver GC, and the frames are vocab-sized.
        vocab = nxt

    n_sym = vocab.select(
        F.col("__w").alias("__word"),
        F.size(F.split(F.col("__s"), _BPE_SEP)).cast("bigint").alias(
            "__n_sym"
        ),
    )
    per_doc = (
        df.where(F.col(text_col).isNotNull())
        .select("doc_id", F.explode(tokens(text_col)).alias("__word"))
        .join(n_sym, "__word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ws_tokens"),
            F.sum("__n_sym").alias("n_bpe_tokens"),
        )
    )
    out = (
        df.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .na.fill({"n_ws_tokens": 0, "n_bpe_tokens": 0})
    )
    # finalize(out) only: vocab is localCheckpointed (no CacheManager
    # entry to unpersist) and is reclaimed by ContextCleaner once this
    # frame drops out of scope.
    return finalize(out)


def bigram_lm_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-trained bigram language-model quality score (the CCNet
    recipe, Wenzek et al. 2020: score each document with an LM trained on
    the corpus itself and keep the predictable head).  Per document, the
    mean conditional probability p(w2|w1) = c(w1,w2)/c(w1,·) over its
    adjacent token pairs — high = the document is made of common
    transitions, low = word-soup.

    Engine-exact without logs: each bigram contributes
    ``round(1e6 · c2/c1)`` micro units (both counts are exact integers,
    so the single double division + round is the same correctly-rounded
    IEEE op on any engine — the BM25 convention), the per-doc sum is an
    integer sum, and the mean uses integer division (``DIV``).  No float
    ever crosses an aggregation.

    Scale posture: ONE corpus-sized shuffle to count bigrams (map-side
    partial agg); the unigram-context counts derive from the bigram
    table (vocab²-sized, not corpus-sized).  Scoring joins the exploded
    corpus against the count table on (w1, w2) — broadcastable for
    bounded vocabularies, a plain hash join otherwise — then one
    (doc_id) shuffle for the per-doc sum.  Shuffle rows are token pairs
    and bigints; never full text.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    # arrays_zip of two shifted slices, NOT a transform(sequence →
    # struct) lambda: higher-order functions evaluate interpreted per
    # element, and the lambda form measured ~5× slower on the corpus
    # explode (2.3 s vs 0.45 s warm at sf0.1).  slice/arrays_zip/explode
    # all stay inside whole-stage codegen.
    z = F.arrays_zip(
        F.slice(toks, 1, n_tok - 1), F.slice(toks, 2, n_tok - 1)
    )
    bigrams = F.when(n_tok >= 2, z).otherwise(F.array())
    # The exploded bigram stream has two consumers (model training and
    # scoring); persist it so the corpus text is scanned ONCE, not per
    # branch — the bm25_topk hits-persist precedent.  Cached rows are
    # (id, token, token) triples, far smaller than the text they derive
    # from.
    from k8stream_spark.analytics.similarity import _spread

    # _spread (guide §2.5, r15): the tokenize+zip+explode cache-
    # population pass is the corpus-sized work; single-row-group local
    # input would run it on one core.  No-op on partitioned input.
    ex = _spread(df.where(F.col(text_col).isNotNull()), "doc_id").select(
        "doc_id", F.explode(bigrams).alias("__b")
    ).select(
        "doc_id",
        F.col("__b").getField("0").alias("__w1"),
        F.col("__b").getField("1").alias("__w2"),
    ).persist()
    c2 = ex.groupBy("__w1", "__w2").agg(F.count(F.lit(1)).alias("__c2"))
    # Context totals derive from the bigram table — no second corpus pass.
    c1 = c2.groupBy("__w1").agg(F.sum("__c2").alias("__c1"))
    model = c2.join(c1, "__w1").select(
        "__w1",
        "__w2",
        F.round(
            F.lit(1000000.0) * F.col("__c2") / F.col("__c1")
        ).cast("bigint").alias("__m"),
    )
    per_doc = (
        ex.join(model, ["__w1", "__w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__m").alias("__sum_m"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("__sum_m DIV n_bigrams").alias("lm_micro"),
        )
    )
    out = (
        df.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .na.fill({"n_bigrams": 0, "lm_micro": 0})
    )
    from k8stream_spark.analytics._cache import finalize

    return finalize(out, ex)


def _cms_bucket(
    row: int, token_col: str, width: int, seed: str
) -> Column:
    """Counter column for CMS row ``row``: first 8 md5 hex digits of
    ``seed:row:token`` mod ``width`` — pure codegen, shared by the batch
    sketch and the streaming counter (``streaming/stateful.py``)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{seed}:{row}:"), F.col(token_col))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_token_counts(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 64,
    seed: str = "cms-v1",
) -> DataFrame:
    """Count-Min Sketch term frequencies, audited against truth
    (Cormode & Muthukrishnan 2005) — the streaming-memory answer to
    "how often does each token occur" when the exact token table is too
    big to hold: ``depth × width`` counters instead of |vocab| cells,
    estimates never undercount, overcount bounded by εN per row.

    Deterministic end to end: bucket j for row i is the first 8 md5 hex
    digits of ``seed:i:token`` mod ``width`` — no RNG state, so the
    whole sketch (bucket sums AND the min-estimates) replays in the
    DuckDB oracle and even the APPROXIMATE estimates hash-check, the
    same posture as the LSH queries.  Output per distinct token:
    (token, tf_true, cms_est, overcount) with overcount = est − true
    ≥ 0 by construction — the audit row a pipeline would alert on.

    Scale: one corpus-sized shuffle (the exact tf groupBy, map-side
    combined); everything after runs on the vocab-sized frame — the
    depth×|vocab| bucket explode, the depth×width counter table, and
    the estimate join are all tiny.  In a pure-streaming deployment the
    counter table is the only state; this batch form exists to measure
    the sketch against truth.
    """
    tf = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf_true"))
        .persist()
    )
    bucket = lambda row: _cms_bucket(row, "token", width, seed)  # noqa: E731
    rows = [
        tf.select(
            "token",
            "tf_true",
            F.lit(j).cast("bigint").alias("row_id"),
            bucket(j).alias("bucket"),
        )
        for j in range(depth)
    ]
    hashed = rows[0]
    for r in rows[1:]:
        hashed = hashed.unionByName(r)
    hashed = hashed.persist()
    counters = hashed.groupBy("row_id", "bucket").agg(
        F.sum("tf_true").alias("bucket_sum")
    )
    est = (
        hashed.join(counters, ["row_id", "bucket"])
        .groupBy("token")
        .agg(
            F.max("tf_true").alias("tf_true"),
            F.min("bucket_sum").alias("cms_est"),
        )
    )
    out = est.select(
        "token",
        "tf_true",
        "cms_est",
        (F.col("cms_est") - F.col("tf_true")).alias("overcount"),
    )
    from k8stream_spark.analytics._cache import finalize

    return finalize(out, tf, hashed)


def quality_yield_curve(
    df: DataFrame, text_col: str = "text", n_buckets: int = 10
) -> DataFrame:
    """Filter yield curve: bucket documents into score deciles
    (``quality_classifier_score`` order) and report, per bucket, the
    docs/tokens it holds and the CUMULATIVE docs/tokens kept if the
    filter threshold were set at that bucket's floor — the table a
    curation run reads before choosing its quality cutoff (every
    "keep top X%" decision is a row of this curve).

    Deterministic: ntile over (score desc, doc_id) — the id tiebreak
    pins bucket membership, so the same curve comes out of any engine.
    All outputs exact integers.

    Scale: scoring is the zero-shuffle hashed-linear projection; the
    ntile window is ONE total-order sort of (score, id, n_tokens)
    rows — the honest global-sort cost every exact quantile split pays
    (at 100 TB swap in ``quality_yield_curve_approx``, the histogram
    -bin twin whose boundaries resolve on a bin table instead of a
    global sort).  The cumulative pass runs over ``n_buckets`` rows —
    constant.
    """
    scored = quality_classifier_score(df, text_col)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bucketed = scored.select(
        "doc_id",
        "n_tokens",
        "score",
        F.ntile(n_buckets).over(w).cast("bigint").alias("bucket"),
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("score").alias("score_floor"),
    )
    cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "score_floor",
        F.sum("n_docs").over(cum).alias("cum_docs"),
        F.sum("n_tokens").over(cum).alias("cum_tokens"),
    )


def quality_yield_curve_approx(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10,
    bin_width: int = 20000,
) -> DataFrame:
    """The 100 TB twin of ``quality_yield_curve``: the exact curve's
    ntile is ONE total-order sort of every (score, id, n_tokens) row —
    an honest cost, but a data-sized SinglePartition no 1000-executor
    plan should carry.  This variant replaces it with the
    ``value_quantiles_sketch`` discipline: scores histogram into
    fixed-width bins, decile boundaries resolve on the BIN TABLE, and
    nothing data-sized ever crosses a single-partition exchange.

    Plan shape: scoring is the zero-shuffle hashed-linear projection
    (``quality_classifier_score``); ONE (bin)-keyed shuffle with
    map-side combine carries (count, Σtokens, min score) triples —
    state is score-range / bin_width counters (~10²–10³ bins), fixed
    however big the corpus; every window/aggregate after that runs
    over the bin table.  No join back to the corpus at all: per-bin
    aggregates roll up to buckets directly, so the approx curve costs
    ONE corpus pass + bin-table work.

    Approximation contract (deterministic, oracle-replayable — every
    boundary decision is an int64 compare, no t-digest): an entire bin
    lands in the bucket of its HIGHEST-scoring document, i.e.
    bucket(bin) = (n_buckets · cum_before) div n_total + 1 with
    cum_before = docs in higher-score bins.  Bucket populations
    therefore deviate from n/10 by at most one bin's count, and a
    bucket can be empty only when one bin exceeds n/10 docs — the
    standard histogram-quantile error bound: boundaries are correct to
    within one ``bin_width`` of score.  ``score_floor`` is the EXACT
    min score of the bucket's members (bin mins roll up), not a bin
    edge.  Output schema matches the exact curve; empty buckets are
    absent rather than zero-filled.
    """
    scored = quality_classifier_score(df, text_col)
    # floor(score / width) via IEEE double divide: exact for |score|
    # < 2^53 because non-multiples of width sit >= 1/width from the
    # nearest integer quotient — far outside double rounding error —
    # and exact multiples divide exactly.  Both engines repeat it
    # bit-for-bit (the value_quantiles_sketch argument).
    b = F.floor(
        F.col("score").cast("double") / F.lit(float(bin_width))
    ).cast("bigint")
    bins = scored.groupBy(b.alias("__bin")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("n_tokens").alias("__t"),
        F.min("score").alias("__floor"),
    )
    # Bin-table-sized windows (~10³ rows): cum_before in score-desc
    # order and the grand total.  The SinglePartition here is over
    # BINS, never documents — the allowlisted constant-size shape.
    w_before = Window.orderBy(F.col("__bin").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy(F.col("__bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    assigned = bins.select(
        "__bin",
        "__n",
        "__t",
        "__floor",
        F.coalesce(F.sum("__n").over(w_before), F.lit(0)).alias("__cb"),
        F.sum("__n").over(w_all).alias("__nt"),
    ).withColumn(
        "bucket",
        (
            F.expr(f"({n_buckets} * __cb) div __nt") + F.lit(1)
        ).cast("bigint"),
    )
    per_bucket = assigned.groupBy("bucket").agg(
        F.sum("__n").alias("n_docs"),
        F.sum("__t").alias("n_tokens"),
        F.min("__floor").alias("score_floor"),
    )
    cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "score_floor",
        F.sum("n_docs").over(cum).alias("cum_docs"),
        F.sum("n_tokens").over(cum).alias("cum_tokens"),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    ranks: tuple[int, ...] = (1, 2, 5, 10, 20, 50),
) -> DataFrame:
    """Vocabulary coverage curve: for each requested head size r, the
    r-th most frequent token and the fraction of all corpus token
    occurrences the top-r head covers (integer ppm) — the Zipf head/tail
    report behind tokenizer-vocabulary and stopword decisions.

    Exact integers end to end: tf counts, a (tf desc, token) rank with
    a pinned tiebreak, a cumulative integer sum, and coverage_ppm =
    floor(1e6·cum/total) — one correctly-rounded double op on exact
    ints, identical on any engine.

    Scale: one corpus-sized shuffle (the tf groupBy, map-side
    combined); the rank window and cumulative sum run over the
    vocab-sized frame.  The vocab rank window is a single total order
    — fine for any real vocabulary (10⁵–10⁶ rows).
    """
    tf = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.orderBy(F.col("tf").desc(), F.col("token").asc())
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = tf.agg(F.sum("tf").alias("__t"))
    ranked = tf.select(
        "token",
        "tf",
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.sum("tf").over(cum).alias("cum_tf"),
    ).where(F.col("rank").isin(*ranks))
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "token",
        "tf",
        "cum_tf",
        F.floor(
            F.lit(1000000.0) * F.col("cum_tf") / F.col("__t")
        ).cast("bigint").alias("coverage_ppm"),
    )


def source_lang_cube(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus accounting over ``CUBE(source, lang)`` — every mix report a
    dataset card needs (per source, per language, per source×language,
    and the grand total) in ONE aggregation pass.

    Spark plans a cube as a single expand + hash aggregate: the scan runs
    once and the expand multiplies rows 4× (2^dims) BEFORE the shuffle,
    which still beats four separate queries (four scans, four shuffles)
    at any scale — and the shuffle rows are (group key, count, sum)
    triples, never text.  ``gid`` disambiguates a real NULL group member
    from a cube subtotal (2·grouping(source) + grouping(lang), the
    engine-portable explicit form).  All aggregates are exact integers.
    """
    n_tok = F.size(tokens(text_col)).cast("bigint")
    return (
        df.select("source", "lang", n_tok.alias("__nt"))
        .cube("source", "lang")
        .agg(
            (F.grouping("source") * 2 + F.grouping("lang"))
            .cast("bigint")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
        )
        .select("source", "lang", "gid", "n_docs", "n_tokens")
    )
