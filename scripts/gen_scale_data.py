"""Deterministic scale-up fixture generator (r10 task 1 / r11 item 1).

The driver ships read-only fixtures up to sf0.1 (600k lineitem rows);
the "plans you'd want at 100x scale" bar needs evidence PAST that.
This script generates sf1-and-beyond fixtures (default --mult 10 =
sf1, ~6M lineitem rows) whose schemas, value ranges, categorical
distributions, planted duplicate structure, and parquet physical
format (TIMESTAMP(MICROS), matching the driver's — see _ts_array and
the measured sf0.001/sf0.1 footers) replicate the sf0.1
fixtures — measured from /root/testdata/sf0.1 footers and profiles,
not copied from any generator source (none is available).

Correctness at the generated scale is still engine-vs-engine: the
oracle gate (scripts/check_oracle.py) runs Spark AND DuckDB over the
SAME generated parquet, so nothing about the comparison depends on
matching the driver's RNG — only the scaling measurements do, and for
those the structural knobs that matter are pinned:

* documents: vocab scaled V = 31·mult^(1/3) (see vocab_for_mult —
  holds the 3-gram shingle-collision shape scale-invariant; stopword
  share pinned at the measured 2/31 via _token_probs), 10-100
  whitespace tokens/doc, 20 sources, 5 langs at the measured sf0.1
  proportions, ~5% planted near-dup docs (a >=30-token base doc with
  exactly ONE token substituted, never to itself ->
  3-gram-shingle Jaccard ~0.8-0.95, the sf0.1 MinHash-verified band;
  256 pairs / 5000 docs measured) plus 0.16% exact dups (the measured
  sf0.1 rate): near-dup PAIR count scales linearly, like a real crawl
  with a constant dup rate.  scripts/fidelity_audit.py gates all of
  this against the driver fixture.
* embeddings: unit-norm isotropic float32[64] with NO planted
  near-dups — measured from sf0.1: max pair cosine 0.601, pair-cosine
  std 0.125 (pure random tail; the 0.45-threshold "near-dups" the
  tests exercise ARE that tail, 144 pairs / 2000 vectors), labels
  uniform 0-9 and independent of geometry.  Note the structural
  consequence: the random tail above a fixed cosine grows with PAIR
  count, i.e. QUADRATICALLY in n — near-dup outputs at mult=10 are
  ~100x sf0.1, inherent to the fixture design, not a bug.
* lineitem/orders: 1-7 lines per order (mean ~4.07), same flag /
  status / priority frequencies, date ranges, and price/discount/tax
  ranges as sf0.1.
* events: 5 types uniform, 30-day Jan-2024 window, exponential-ish
  value (mean ~50), users = events/66 like sf0.1.

Usage:
    python scripts/gen_scale_data.py [--mult 10] [--out /root/repo/.scale/sf1]

Writes one .parquet per table. Deterministic for a given mult
(numpy PCG64 seeded 42; no wall-clock anywhere).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column customer data fast filter g group hash join "
    "key line merge order part query scan slow small sort spark stream "
    "table the value vector window zzz"
).split()
# 31 words measured in the sf0.1 corpus; the exact word SET only needs
# to be plausible (text ops hash tokens, they don't interpret them).
assert len(VOCAB) == 31


def vocab_for_mult(mult: int) -> np.ndarray:
    """Vocabulary scaled as V = round(31 · mult^(1/3)) — mult=1 is the
    measured sf0.1 vocab EXACTLY (the same 31 words, uniform draw);
    larger fixtures append deterministic filler words (w031, w032, …).

    Why ∛: the text operators discriminate on 3-gram SHINGLE collision
    statistics (boilerplate df, canonical dedup, containment).  The
    shingle space is ~V³; holding n_docs/V³ constant keeps the shingle
    document-frequency SHAPE scale-invariant, where a fixed 31-word
    vocab saturates it — at 50k docs every possible 3-shingle is
    "boilerplate" and docs_remove_boilerplate degenerates to 0 rows
    kept (measured r12; verdict task 7).  The sf0.1-measured statistics
    a crawl preserves are per-doc rates and df SHAPE, not the literal
    token histogram — which cannot survive any vocab growth."""
    v = max(31, round(31 * float(mult) ** (1.0 / 3.0)))
    extra = [f"w{i:03d}" for i in range(31, v)]
    return np.array(VOCAB + extra)

LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.43, 0.15, 0.15, 0.135, 0.135]  # measured sf0.1 proportions
SOURCES = [f"src{i}" for i in range(20)]

def _ts_array(epoch_ns: np.ndarray) -> pa.Array:
    # The driver fixtures store TIMESTAMP(MICROS) (verified from the
    # sf0.001/0.01/0.1 footers); match it so load_table and the DuckDB
    # oracle read the generated files through the identical path.
    return pa.array(
        (epoch_ns.astype("int64") // 1000), type=pa.timestamp("us")
    )


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, version="2.6", compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}")


def gen_dims(out_dir: str) -> None:
    region = pa.table(
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        }
    )
    _write(out_dir, "region", region)
    nation = pa.table(
        {
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }
    )
    _write(out_dir, "nation", nation)


def gen_tpch(rng: np.random.Generator, out_dir: str, mult: int) -> None:
    n_cust = 15000 * mult
    n_supp = 1000 * mult
    n_part = 20000 * mult
    n_ord = 150000 * mult

    _write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": np.arange(n_cust, dtype=np.int64),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
                "c_acctbal": np.round(
                    rng.uniform(-1000.0, 10000.0, n_cust), 2
                ),
                "c_mktsegment": rng.choice(
                    [
                        "AUTOMOBILE",
                        "BUILDING",
                        "FURNITURE",
                        "HOUSEHOLD",
                        "MACHINERY",
                    ],
                    n_cust,
                ),
            }
        ),
    )
    _write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": np.arange(n_supp, dtype=np.int64),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
                "s_acctbal": np.round(rng.uniform(0.0, 10000.0, n_supp), 2),
            }
        ),
    )
    # The measured sf0.1 p_name vocabulary (8 adjectives x 7 nouns):
    # q9 filters '%widget%' and q20 'small%', so the word sets are part
    # of the query surface, not decoration.
    adjectives = ["blue", "hot", "small", "cold", "new", "old", "red", "large"]
    nouns = ["ring", "rod", "bolt", "anvil", "widget", "gear", "plate"]
    _write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": np.arange(n_part, dtype=np.int64),
                "p_name": [
                    f"{adjectives[i % 8]} {nouns[(i // 8) % 7]}"
                    for i in range(n_part)
                ],
                "p_brand": [f"Brand#{1 + i % 25}" for i in range(n_part)],
                "p_type": rng.choice(
                    ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"],
                    n_part,
                ),
                "p_size": rng.integers(1, 51, n_part).astype(np.int32),
                "p_retailprice": np.round(
                    900.0 + (np.arange(n_part) % 1000) * 0.1, 2
                ),
            }
        ),
    )

    day_ns = 86_400_000_000_000
    o_date_ns = (
        np.datetime64("1995-01-01").astype("datetime64[ns]").astype(np.int64)
        + rng.integers(0, 2404, n_ord) * day_ns
    )
    _write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": np.arange(n_ord, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, n_ord),
                "o_orderstatus": rng.choice(["O", "P", "F"], n_ord),
                "o_totalprice": np.round(
                    rng.uniform(1000.0, 500000.0, n_ord), 2
                ),
                "o_orderdate": _ts_array(o_date_ns),
                "o_orderpriority": rng.choice(
                    [
                        "1-URGENT",
                        "2-HIGH",
                        "3-MEDIUM",
                        "4-NOT SPECIFIED",
                        "5-LOW",
                    ],
                    n_ord,
                ),
            }
        ),
    )

    # lineitem: 1-7 lines per order, mean ~4 (measured 4.075)
    lines_per = rng.integers(1, 8, n_ord)
    okey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = okey.shape[0]
    lnum = np.concatenate([np.arange(1, k + 1) for k in lines_per]).astype(
        np.int32
    )
    ship_ns = (
        np.repeat(o_date_ns, lines_per)
        + rng.integers(1, 96, n_li) * day_ns
    )
    _write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": okey,
                "l_partkey": rng.integers(0, n_part, n_li),
                "l_suppkey": rng.integers(0, n_supp, n_li),
                "l_linenumber": lnum,
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(
                    rng.uniform(900.0, 105000.0, n_li), 2
                ),
                "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
                "l_returnflag": rng.choice(["A", "N", "R"], n_li),
                "l_linestatus": rng.choice(["O", "F"], n_li),
                "l_shipdate": _ts_array(ship_ns),
            }
        ),
    )


def gen_events(rng: np.random.Generator, out_dir: str, mult: int) -> None:
    n = 100000 * mult
    n_users = max(1, n // 66)
    start = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(
        np.int64
    )
    span = 30 * 86_400_000_000_000
    _write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": _ts_array(start + rng.integers(0, span, n)),
                "user_id": rng.integers(0, n_users, n),
                "event_type": rng.choice(
                    ["view", "click", "purchase", "signup", "error"], n
                ),
                "value": np.round(
                    np.minimum(rng.exponential(50.0, n), 600.0), 2
                ),
                "props": [
                    '{"k": %d}' % k for k in rng.integers(0, 100, n)
                ],
            }
        ),
    )


STOPWORDS = ("the", "a")


def _token_probs(vocab: np.ndarray) -> np.ndarray:
    """Per-token draw probabilities that hold the STOPWORD SHARE at the
    measured sf0.1 value (2/31 ≈ 0.0645 — the quality-score family's
    statistic) as the vocabulary grows: the two stopwords keep 1/31
    each, the remaining 29/31 mass spreads uniformly over every other
    word.  At mult=1 this is exactly uniform 1/31 per word."""
    p = np.full(
        len(vocab), (29.0 / 31.0) / (len(vocab) - len(STOPWORDS))
    )
    p[np.isin(vocab, STOPWORDS)] = 1.0 / 31.0
    return p / p.sum()


def gen_documents(rng: np.random.Generator, out_dir: str, mult: int) -> None:
    n = 5000 * mult
    n_near = int(n * 0.05)
    # 0.0016 is the exact-duplicate rate MEASURED on the driver's sf0.1
    # fixture (1 - distinct(text)/n, fidelity_audit.py) — the earlier
    # 0.002 plant overshot it ~2x once near-dup substitutions that
    # accidentally re-picked the original token were counted.
    n_exact = max(1, round(n * 0.0016))
    n_base = n - n_near - n_exact

    vocab = vocab_for_mult(mult)
    nv = len(vocab)
    probs = _token_probs(vocab)
    lens = rng.integers(10, 101, n_base)
    flat = rng.choice(nv, size=int(lens.sum()), p=probs)
    texts: list[str] = []
    pos = 0
    for k in lens:
        texts.append(" ".join(vocab[flat[pos:pos + k]]))
        pos += k
    # Near-dups: exactly ONE substituted token in a >=30-token base,
    # so 3-gram shingle Jaccard lands ~(L-5)/(L+1) in [0.8, 0.95] —
    # the J>=0.8 band the MinHash S-curve is tuned for.  The
    # replacement is forced != the original, so near-dups never leak
    # into the exact-dup rate.
    long_idx = [i for i, k in enumerate(lens) if k >= 30]
    widx = {w: i for i, w in enumerate(vocab)}
    for _ in range(n_near):
        base = texts[long_idx[int(rng.integers(0, len(long_idx)))]].split(" ")
        p = int(rng.integers(0, len(base)))
        sub = int(rng.integers(0, nv - 1))
        if sub >= widx[base[p]]:
            sub += 1
        base[p] = vocab[sub]
        texts.append(" ".join(base))
    for _ in range(n_exact):
        texts.append(texts[int(rng.integers(0, n_base))])

    order = rng.permutation(n)
    texts = [texts[i] for i in order]
    _write(
        out_dir,
        "documents",
        pa.table(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": texts,
                "lang": rng.choice(LANGS, n, p=LANG_P),
                "source": rng.choice(SOURCES, n),
                "n_chars": np.array(
                    [len(t) for t in texts], dtype=np.int64
                ),
            }
        ),
    )


def gen_embeddings(
    rng: np.random.Generator,
    out_dir: str,
    mult: int,
    clusters: int = 0,
    sigma: float = 0.06,
) -> None:
    n = 2000 * mult
    if clusters <= 0:
        # Pure isotropic unit vectors — the measured sf0.1 structure (no
        # planted pairs; the >=0.45-cosine tail is the "near-dup" set).
        full = rng.standard_normal((n, 64))
        full /= np.linalg.norm(full, axis=1, keepdims=True)
        full = full.astype(np.float32)
        labels = rng.integers(0, 10, n).astype(np.int32)
    else:
        # Clustered variant (r15, VERDICT r13 task 3 / r14 task 3):
        # mixture of von-Mises-Fisher-like bumps — C isotropic unit
        # centers, member = unit(center + sigma*noise), sizes mildly
        # imbalanced via Dirichlet(2).  The driver fixture is isotropic
        # (the ANN worst case, no structure to prune); every real
        # embedding corpus HAS topic structure, and this fixture pins
        # the regime where IVF's nprobe law and LSH's candidate volume
        # are allowed to exploit it.  sigma=0.06 gives within-cluster
        # pair cosine ~1/(1+64*sigma^2) ~= 0.81 (semantic-similarity
        # band) and between-cluster cosine ~0 mean, ~0.1 mean-abs (random
        # unit centers in 64-dim).  Labels follow clusters (cluster % 10) — realistic
        # class structure, measured by the audit, NOT used by the ANN
        # sweeps.  scripts/fidelity_audit.py --clustered gates all of
        # this on every regen.
        centers = rng.standard_normal((clusters, 64))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        w = rng.dirichlet(np.full(clusters, 2.0))
        assign = rng.choice(clusters, size=n, p=w)
        full = centers[assign] + sigma * rng.standard_normal((n, 64))
        full /= np.linalg.norm(full, axis=1, keepdims=True)
        full = full.astype(np.float32)
        labels = (assign % 10).astype(np.int32)
    _write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.array(
                    list(full), type=pa.list_(pa.float32())
                ),
                "label": labels,
            }
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10,
                    help="scale multiplier relative to sf0.1 (10 = sf1)")
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    ap.add_argument("--clusters", type=int, default=0,
                    help="embeddings: 0 = isotropic (driver-measured); "
                         ">0 = mixture of that many vMF-like bumps")
    ap.add_argument("--cluster-sigma", type=float, default=0.06)
    ap.add_argument("--embeddings-only", action="store_true",
                    help="write only embeddings.parquet (ANN sweeps "
                         "need nothing else; skips the slow tables)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(42))
    print(f"generating mult={args.mult} fixtures into {args.out}")
    if not args.embeddings_only:
        gen_dims(args.out)
        gen_tpch(rng, args.out, args.mult)
        gen_events(rng, args.out, args.mult)
        gen_documents(rng, args.out, args.mult)
    gen_embeddings(rng, args.out, args.mult, clusters=args.clusters,
                   sigma=args.cluster_sigma)
    print("done")


if __name__ == "__main__":
    main()
