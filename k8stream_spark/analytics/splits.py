"""Deterministic dataset splitting and class-balanced downsampling —
the reproducibility layer of a training-data pipeline.

Both operators assign each row a stable bucket in [0, 100) derived from
``md5(seed:id)`` — a pure column expression (JVM-side, no RNG state), so
the same row lands in the same split on every run, every engine, and
every cluster size.  ``sample()``-style probabilistic splits are NOT
reproducible across partitionings; hash-bucketing is how production
pipelines pin train/val/test membership.  md5 is engine-portable (the
DuckDB oracle computes the identical buckets), and the first 8 hex chars
give 32 uniform bits — far more than the 100 buckets need.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(
    id_col: Column | str, seed: str = "split-v1", buckets: int = 100
) -> Column:
    """Stable bucket in [0, buckets): first 32 bits of md5(seed:id)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    tagged = F.concat(F.lit(seed), F.lit(":"), c.cast("string"))
    return (
        F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split-v1",
    weights: Sequence[int] = (90, 5, 5),
    names: Sequence[str] = ("train", "val", "test"),
) -> DataFrame:
    """Assign every row to a named split by hash bucket.  ``weights`` are
    integer percentages (cumulative ranges over the bucket space), so
    membership is exact and auditable, not probabilistic."""
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = sum(weights)
    bucket = hash_bucket(id_col, seed, total)
    expr = None
    cum = 0
    for w, name in zip(weights, names):
        cum += w
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("bucket", bucket).withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    class_col: str,
    rates: Mapping[str, int],
    id_col: str = "doc_id",
    seed: str = "sample-v1",
    default_rate: int = 100,
) -> DataFrame:
    """Deterministic per-class downsampling: keep a row iff its hash
    bucket < the class's percentage rate.  The class-imbalance fix for
    training corpora (keep all rare positives, thin the dominant class),
    reproducible run-over-run because membership is a pure function of
    (seed, id).  One filter expression — no shuffle, no RNG."""
    bucket = hash_bucket(id_col, seed, 100)
    rate = None
    for cls, r in sorted(rates.items()):
        cond = F.col(class_col) == cls
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = F.lit(default_rate) if rate is None else rate.otherwise(default_rate)
    return df.where(bucket < rate)


def pack_chunks(
    df,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    capacity: int = 2048,
    seed: str = "pack-v1",
):
    """Sequence-packing accounting (the concat-and-chunk strategy LLM
    training pipelines use): documents are laid out in a deterministic
    hash-shuffled order, token counts accumulate, and the stream is cut
    into fixed ``capacity``-token context windows.  Returns, per doc,
    its position and the [start_chunk, end_chunk] window range it lands
    in (a doc longer than the remaining window spans several).

    Deterministic by construction: the order is md5(seed:id) (engine-
    portable — the oracle reproduces it exactly), and chunk indices are
    pure prefix-sum arithmetic, so the layout is reproducible run over
    run — the property that makes training resumable.  One global
    window over the hash order; at 100 TB use
    :func:`pack_chunks_sharded`, which runs the same math per hash
    shard in parallel with no single-partition exchange.
    """
    order_key = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    w = Window.orderBy(order_key.asc(), F.col(id_col).asc())
    cum = F.sum(F.col(n_tokens_col)).over(w)
    return df.select(
        F.col(id_col),
        F.col(n_tokens_col),
        F.row_number().over(w).cast("bigint").alias("pack_pos"),
        F.floor((cum - F.col(n_tokens_col)) / capacity)
        .cast("bigint")
        .alias("start_chunk"),
        F.floor((cum - 1) / capacity).cast("bigint").alias("end_chunk"),
    )


def pack_chunks_sharded(
    df,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    capacity: int = 2048,
    seed: str = "pack-v1",
    n_shards: int = 32,
):
    """The 100 TB form of :func:`pack_chunks`: hash-shard the corpus,
    pack every shard independently (the window PARTITIONs BY shard, so
    the prefix sum runs on ``n_shards`` parallel streams — no
    single-partition exchange over the data), then lift each shard's
    local chunk indices into one global, non-overlapping chunk space.

    The lift needs only an ``n_shards``-row offset table: per shard,
    the number of chunks it produces (``max(local_end) + 1``), prefix-
    summed in shard order via a triangular self-join (shard b < shard a)
    — the distributed prefix-sum over a small key space, so the executed
    plan has ZERO single-partition exchanges; the n_shards² pair volume
    is trivial for any sane shard count.  The offset table then
    broadcasts back onto the data.  Each
    doc's (shard, pack_pos, start/end chunk) stays a pure function of
    (seed, id, corpus) — deterministic and resumable, same as the
    unsharded form — but the global doc interleaving differs from
    ``pack_chunks`` (shard-major instead of one global hash order):
    equally valid as a layout, not byte-identical to the 1-shard one.

    Chunk-space invariants (pinned by tests): within a shard, chunk
    indices follow the prefix sum exactly; across shards the
    [base, base + n_chunks) ranges are disjoint and contiguous in shard
    order; ``n_shards=1`` reproduces ``pack_chunks`` row-for-row.
    """
    shard = hash_bucket(F.col(id_col), f"{seed}:shard", n_shards)
    order_key = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy(
        order_key.asc(), F.col(id_col).asc()
    )
    cum = F.sum(F.col(n_tokens_col)).over(w)
    local = df.withColumn("shard", shard.cast("bigint")).select(
        F.col("shard"),
        F.col(id_col),
        F.col(n_tokens_col),
        F.row_number().over(w).cast("bigint").alias("pack_pos"),
        F.floor((cum - F.col(n_tokens_col)) / capacity)
        .cast("bigint")
        .alias("__ls"),
        F.floor((cum - 1) / capacity).cast("bigint").alias("__le"),
    )
    # n_shards rows: chunks produced per shard, prefix-summed in shard
    # order.  A global-order window would pull even this tiny frame into
    # one partition; the triangular self-join keeps the plan free of
    # SinglePartition exchanges at O(n_shards²) pairs — nothing at any
    # realistic shard count.
    nch = local.groupBy("shard").agg(
        (F.max("__le") + 1).alias("__n_chunks")
    )
    prior = F.broadcast(
        nch.select(
            F.col("shard").alias("__pshard"),
            F.col("__n_chunks").alias("__pn"),
        )
    )
    bases = (
        nch.join(prior, F.col("__pshard") < F.col("shard"), "left")
        .groupBy("shard")
        .agg(
            F.coalesce(F.sum("__pn"), F.lit(0)).cast("bigint").alias("__base")
        )
    )
    return (
        local.join(F.broadcast(bases), "shard")
        .select(
            "shard",
            id_col,
            n_tokens_col,
            "pack_pos",
            (F.col("__base") + F.col("__ls")).alias("start_chunk"),
            (F.col("__base") + F.col("__le")).alias("end_chunk"),
        )
    )


def source_temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    target_pct: int = 30,
    seed: str = "mix-v1",
) -> DataFrame:
    """Temperature-weighted multi-source sampling — the data-blend step
    of multilingual / multi-domain pre-training (mT5/XLM-R style): a
    source's share of the training mix is proportional to
    ``(n_source/N)^T`` with T = 0.5, flattening the natural distribution
    so small sources are up-weighted relative to their raw frequency.
    ``target_pct`` is the total corpus fraction to sample (an integer
    percent, kept exact on purpose).

    Exactness: the whole pipeline is INTEGER arithmetic so any engine
    agrees row-for-row.  T = 0.5 is the one temperature with an exact
    integer realization: ``p_s ∝ sqrt(n_s)`` (the global N cancels), and
    ``S_s = floor(sqrt(n_s·10^6))`` is cross-engine deterministic
    because IEEE mandates correctly-rounded sqrt and ``n_s·10^6`` is an
    exactly-representable double below 2^53 (n_s ≤ ~9e9 per source —
    beyond that, drop to a 10^2 scale).  A row is kept iff

        H · denom · n_s  <  S_s · m · 2^32

    where H is the row's 32-bit md5 bucket, ``denom = Σ S_t`` and
    ``m = N·target_pct div 100`` — the cross-multiplied form of
    ``H/2^32 < rate_s`` with no division or float anywhere; products are
    DECIMAL(38,0) (HUGEINT in the oracle), exact to ~1e32.

    Scale posture (100 TB): one map-side count per source, the per-source
    weight table broadcasts (sources number in the thousands at most),
    and selection is a single codegen predicate per row — no extra
    shuffle of corpus data at all.  Deterministic hash selection means
    re-runs, engines, and resumed jobs pick the identical sample (the
    same property ``dataset_split`` pins for train/val/test).
    """
    counts = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = counts.withColumn(
        "__s",
        F.floor(F.sqrt(F.col("__n").cast("double") * 1000000)).cast("bigint"),
    )
    # Corpus totals are ONE row however big the table (bounded driver
    # action, same class as the IVF centroid collect); folding them to
    # literals keeps the keep-predicate a constant-folded codegen
    # expression and avoids a self-referencing join on the counts frame.
    trow = w.agg(F.sum("__n"), F.sum("__s"), F.max("__n")).collect()[0]
    big_n, denom, max_n = int(trow[0]), int(trow[1]), int(trow[2])
    m = (big_n * int(target_pct)) // 100
    # Overflow guard: the keep predicate's LHS is H·denom·n_s with
    # H < 2^32.  Under non-ANSI semantics a DECIMAL(38,0) overflow
    # becomes NULL and `WHERE NULL` silently DROPS the row — a biased
    # sample, not an error — so surface the bound violation loudly here
    # instead.  (The docstring's per-source envelope n_s ≤ ~9e9 sits far
    # inside this product bound; the RHS S·m·2^32 overflows only later.)
    if (1 << 32) * denom * max_n >= 10**38:
        raise ValueError(
            "source_temperature_sample: H*denom*n_s can overflow "
            f"DECIMAL(38,0) (denom={denom}, max n_s={max_n}); rescale "
            "the sqrt weights (e.g. 10^2 instead of 10^6) before "
            "sampling at this corpus size"
        )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed), F.lit(":"), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    keep = F.expr(
        f"CAST(__h AS DECIMAL(38,0)) * {denom} * __n"
        f" < CAST(__s AS DECIMAL(38,0)) * {m}"
        " * CAST(4294967296 AS DECIMAL(38,0))"
    )
    return (
        df.select(F.col(id_col), F.col(source_col))
        .withColumn("__h", h)
        .join(
            F.broadcast(w), F.col(source_col) == F.col("__src")
        )
        .where(keep)
        .select(id_col, source_col)
    )


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global training-order shuffle — the last step before
    writing training shards: every row gets a shard and a position
    within the shard, both pure functions of ``md5(seed:id)``, so the
    epoch-0 data order is reproducible across runs, engines, and
    cluster sizes (``orderBy(rand())`` is none of those).

    Shard = first 32 md5 bits mod ``n_shards``; in-shard order = the
    NEXT 32 bits (independent of the shard bits, so order within a
    shard is uniform), ties broken by id.  Readers stream shards in
    index order and rows by ``pos`` — a full-corpus shuffle without any
    global sort.

    Scale posture (100 TB): ONE hash-partitioned exchange on the shard
    key with a per-shard sort (the window) — the classic write-shuffled
    -shards shape; no single-partition stage anywhere, and shard
    parallelism is the knob (shards ~ executor count × a few).  The
    whole assignment is engine-portable column algebra, oracle-exact.
    """
    tagged = F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    shard = (
        F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("bigint")
        % n_shards
    )
    okey = F.conv(F.substring(F.md5(tagged), 9, 8), 16, 10).cast("bigint")
    w = Window.partitionBy("shard").orderBy(
        F.col("__okey").asc(), F.col(id_col).asc()
    )
    return (
        df.select(
            F.col(id_col),
            shard.alias("shard"),
            okey.alias("__okey"),
        )
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select(id_col, "shard", "pos")
    )


def source_quota_cap(
    df: DataFrame,
    quota: int = 50,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "quota-v1",
    thin_margin: int | None = 4,
) -> DataFrame:
    """Per-source document cap — the domain-capping step of a crawl
    pipeline (no single domain may contribute more than ``quota`` docs):
    keep each source's hash-least ``quota`` rows, order
    ``(md5(seed:id), id)`` so membership is deterministic across runs,
    engines, and cluster sizes.

    Scale posture (100 TB): a naive ``row_number`` over the source
    partition ships EVERY row of the hottest domain into one task.  With
    ``thin_margin`` set, a broadcast per-source rate pre-thins first:
    rows with ``hash_permille >= ceil(quota·margin·1000 / n_s)`` cannot
    be in the hash-least ``quota`` unless the uniform hash is wildly
    lopsided, so the exact window runs over ~quota·margin survivors per
    source instead of n_s.  The thinning is part of the operator's
    DETERMINISTIC definition (the oracle replicates it, so both engines
    agree bit-for-bit even in the astronomically-unlikely shortfall
    case); with margin 4 and quota ≥ 50 the binomial shortfall
    probability is < 1e-40 per source.  ``thin_margin=None`` disables
    the pre-thin (exact by construction at any margin).

    Output: (id, source, rank) for kept rows, rank in [1, quota].
    """
    tagged = F.concat(
        F.lit(seed), F.lit(":"), F.col(id_col).cast("string")
    )
    okey = F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("bigint")
    base = df.select(
        F.col(id_col), F.col(source_col), okey.alias("__okey")
    )
    if thin_margin is not None:
        counts = base.groupBy(source_col).agg(
            F.count(F.lit(1)).alias("__n")
        )
        # ceil(quota·margin·1000 / n_s) in pure integer arithmetic
        # ((a + n - 1) div n — no float division anywhere); >= 1000
        # keeps everything (small sources skip straight to the rank).
        a = quota * thin_margin * 1000
        rate = F.least(
            F.lit(1000).cast("bigint"),
            F.expr(f"({a} + __n - 1) div __n"),
        )
        base = (
            base.join(
                F.broadcast(counts.select(source_col, rate.alias("__r"))),
                source_col,
            )
            # integer cross-multiplied form of okey/2^32 < r/1000, on
            # the SAME order key the rank uses: surviving the thin is
            # monotone in rank order
            .where(F.col("__okey") * 1000 < F.col("__r") * F.lit(4294967296))
            .drop("__r")
        )
    w = Window.partitionBy(source_col).orderBy(
        F.col("__okey").asc(), F.col(id_col).asc()
    )
    return (
        base.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= quota)
        .select(id_col, source_col, "rank")
    )


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    seed: str = "shard-v1",
) -> DataFrame:
    """Deterministic shard assignment + per-shard manifest — the control
    table a training job reads to know what each output shard holds:
    shard id, document count, token count, and an order-insensitive
    64-bit XOR checksum of the member ids' hash keys (so a re-run or a
    re-read can verify shard membership without sorting anything).

    Shard = first 32 md5 bits of ``seed:id`` mod ``n_shards`` — the
    repo's engine-portable hash, so the oracle (and any other engine)
    assigns identically, and assignment is stable under re-partitioning,
    retries, and cluster size changes.  One hash-groupBy on the shard id
    (map-side partial agg); XOR never widens past int64, so the checksum
    is exact at any corpus size.
    """
    tagged = F.concat(
        F.lit(seed), F.lit(":"), F.col(id_col).cast("string")
    )
    okey = F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("bigint")
    n_tok = F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
    return (
        df.select(
            (okey % n_shards).alias("shard_id"),
            okey.alias("__okey"),
            n_tok.cast("bigint").alias("__n"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("n_tokens"),
            F.expr("bit_xor(__okey)").alias("xor_checksum"),
        )
    )


def split_leakage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    seed: str = "split-v1",
    weights: Sequence[int] = (90, 5, 5),
    names: Sequence[str] = ("train", "val", "test"),
    eval_split: str = "test",
) -> DataFrame:
    """Train→eval n-gram leakage audit — the eval-hygiene counterpart of
    ``dataset_split``: for every document the split assigned to
    ``eval_split``, how many of its distinct n-grams also occur in ANY
    train-split document.  A split whose eval docs share most of their
    n-grams with train overstates every benchmark run on it; this is the
    number a pipeline checks BEFORE publishing a split (decontamination
    checks against external eval sets; this checks the split against
    itself).

    Same inverted-index shape as ``eval_contamination`` / n-gram
    Jaccard: explode distinct n-grams, distinct the train side, one
    equi-join on the n-gram, one count per eval doc — shuffles carry
    (ngram, id) rows only, never text.  Exact integers; eval docs
    shorter than ``n`` tokens report 0/0.
    """
    sp = dataset_split(
        df.select(id_col, text_col), id_col, seed, weights, names
    )
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
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

    # _spread (guide §2.5, r15): the tokenize+gram transform is the
    # corpus-sized stage-1 here; single-row-group local input would run
    # it on one core.  No-op on partitioned input.
    ex = _spread(sp, id_col).select(id_col, "split", F.explode(grams).alias("__g"))
    train_grams = (
        ex.where(F.col("split") == "train")
        .select("__g")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        ex.where(F.col("split") == eval_split)
        .join(train_grams, "__g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)).cast("bigint")).alias(
                "n_leaked"
            ),
        )
    )
    return (
        sp.where(F.col("split") == eval_split)
        .select(id_col)
        .join(per_doc, id_col, "left")
        .na.fill({"n_ngrams": 0, "n_leaked": 0})
    )


def mixture_plan(
    df: DataFrame,
    budget_tokens: int = 100_000,
    n_sources: int = 20,
    text_col: str = "text",
    source_col: str = "source",
    weights: Mapping[str, int] | None = None,
) -> DataFrame:
    """Static mixture-sampling plan: given per-source target weights
    and a total token budget, compute each source's sampling rate and
    expected token yield — the planning pass a DoReMi-style or
    hand-tuned mixture pipeline runs BEFORE any sampling job, so the
    fleet is sized from a 20-row plan instead of discovered mid-run.

    Weights: pass ``weights`` (source name → non-negative integer
    weight) for real-world source names; sources absent from the map
    get weight 0 (sampled out, never an error).  When ``weights`` is
    None the deterministic ramp w(srcN) ∝ (n_sources − N) applies
    (replayed verbatim in the oracle) — names that don't match
    ``srcN`` or whose N ≥ n_sources get weight 0 rather than a cast
    error or a negative target:
    target = budget·raw // Σraw, rate = min(1, target·1e6 //
    actual_tokens) in micro, expected = actual·rate // 1e6.  All
    integer arithmetic on non-negative values (targets clamped at 0),
    so Spark's ``div``, DuckDB's ``//`` and Python agree exactly.

    Scale: ONE groupBy(source) with map-side combine — the shuffle is
    |sources| rows of two bigints; token counting is codegen
    (split-size, the ``text_token_count`` convention, empty/null text
    counting 1 like DuckDB's string_split).
    """
    if weights is None:
        total_raw = n_sources * (n_sources + 1) // 2
        # Ramp weight, safe on arbitrary names: try_cast → NULL for
        # non-srcN, greatest(0, …) for N ≥ n_sources; both → weight 0.
        w_expr = F.greatest(
            F.lit(0).cast("bigint"),
            F.coalesce(
                F.lit(n_sources)
                - F.expr(
                    f"try_cast(regexp_replace({source_col}, '^src', '')"
                    " AS BIGINT)"
                ),
                F.lit(0).cast("bigint"),
            ),
        )
    else:
        total_raw = sum(max(int(v), 0) for v in weights.values()) or 1
        pairs: list[Column] = []
        for k, v in weights.items():
            pairs.append(F.lit(k))
            pairs.append(F.lit(max(int(v), 0)).cast("bigint"))
        w_expr = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(source_col)),
            F.lit(0).cast("bigint"),
        )
    toks = F.size(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    ).cast("bigint")
    g = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(toks).cast("bigint").alias("actual_tokens"),
    )
    g = g.withColumn("__w", w_expr).withColumn(
        "target_tokens",
        F.expr(f"({budget_tokens} * __w) div {total_raw}"),
    )
    rate = F.when(
        F.col("actual_tokens") > 0,
        F.least(
            F.lit(1000000).cast("bigint"),
            F.expr("(target_tokens * 1000000) div actual_tokens"),
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    return g.select(
        source_col,
        "n_docs",
        "actual_tokens",
        "target_tokens",
        rate.alias("rate_micro"),
    ).withColumn(
        "expected_tokens",
        F.expr("(actual_tokens * rate_micro) div 1000000"),
    )
