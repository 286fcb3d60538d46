"""OLAP queries over the TPC-H-ish driver tables — the offline-analytics
half the reference delegates to consumers (reference README.md:18-19).

These are the bench headliners, so every one is written for the plan we
want at 100 TB:

  * Aggregations go partial→final automatically (HashAggregate map-side);
    group-by keys are low-cardinality so AQE coalesces the shuffle.
  * Dimension joins (`customer`, `nation`, `region`, `supplier`) are
    explicit ``broadcast`` — the fact tables (`lineitem`, `orders`) never
    shuffle for a join here.
  * Filters sit directly on scan columns → parquet PushedFilters.
  * Money aggregates are rounded to 2 dp — float-stable for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: Quantization step for exact money sums: 8 decimal places.
_QSCALE = 100000000.0
#: hi/lo radix for the two-long decomposition (2^23 — a power of two so the
#: double division below is EXACT, and small enough that both long sums
#: stay overflow-free past 10^12 rows per group; ANSI mode errors loudly
#: beyond that instead of wrapping).
_SPLIT = 8388608


def _scaled_total(col: Column) -> Column:
    """Exact order-independent total of ``col`` as a scaled integer
    (value × 10^8), returned as DECIMAL(38,0).

    Per row the double is quantized with pure-codegen FP ops —
    ``floor(x*1e8 + 0.5)`` (half-up toward +inf) — then split into
    ``hi = floor(v'/2^23)`` and ``lo = floor(v') - hi*2^23 ∈ [0, 2^23)``.
    Division by 2^23 is exact in binary floating point, so both engines
    (Spark and the DuckDB oracle) computing the same IEEE expression get
    the same two longs for every row; two plain LONG sums are then
    order-independent and whole-stage-codegen friendly.  The earlier
    implementation cast each double to DECIMAL(30,8) and summed decimals:
    bit-stable too, but the double→decimal cast goes through BigDecimal/
    Double.toString and the 38-digit sum buffer falls off the compact-long
    fast path — measured 6-7× slower than this formulation on the q1
    aggregate (the r6 bench regression).

    Overflow posture at 100 TB: |value| ≤ ~1.1e5 → |hi| ≤ 1.4e6 and
    lo < 8.4e6, so a single group overflows the long sums only past
    ~1.1e12 rows (≈180 TB of lineitem in ONE group); ANSI mode (on by
    default, session.py) raises instead of silently wrapping there."""
    vp = col * F.lit(_QSCALE) + F.lit(0.5)
    hi = F.floor(vp / F.lit(float(_SPLIT)))
    lo = F.floor(vp) - hi * F.lit(_SPLIT)
    return F.sum(hi).cast("decimal(38,0)") * F.lit(_SPLIT) + F.sum(lo).cast(
        "decimal(38,0)"
    )


def exact_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent money sum, rounded half-away-from-zero to
    ``scale`` decimal places.

    The rounding happens in exact integer space — ``round(tot, scale-8)``
    on the DECIMAL(38,0) scaled total (Spark HALF_UP == DuckDB ROUND on
    decimals == half away from zero) — then ONE deterministic conversion
    to double.  Rounding the double sum instead diverges between engines
    on cent boundaries (…595 vs …59499999…)."""
    r = F.round(_scaled_total(col), scale - 8)
    return r.cast("double") / F.lit(_QSCALE)


def exact_avg(col: Column, scale: int = 4) -> Column:
    """Order-independent mean, rounded half-away-from-zero to ``scale``
    decimal places in exact integer space (repo convention: means round
    integer-side, never on the double quotient).

    With ``tot`` the ×10^8 scaled integer total and ``n`` the row count,
    the rounded quotient is ``sign · floor((2·|tot| + n·d) / (2·n·d))``
    with ``d = 10^(8-scale)`` — all DECIMAL(38,0) integer arithmetic; the
    decimal division is exact because the dividend is pre-reduced to a
    multiple of the divisor via pmod."""
    tot = _scaled_total(col)
    d = 10 ** (8 - scale)
    n = F.count(F.lit(1)).cast("decimal(38,0)")
    p = F.abs(tot) * 2 + n * F.lit(d)
    m = n * F.lit(2 * d)
    q = ((p - F.pmod(p, m)) / m).cast("long")
    sign = F.when(tot < 0, F.lit(-1)).otherwise(F.lit(1))
    return (sign * q).cast("double") / F.lit(float(10**scale))


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "2000-09-02") -> DataFrame:
    """TPC-H Q1 shape: pricing summary report over lineitem."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            exact_sum(charge).alias("sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    topn: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top unshipped-revenue orders for a market segment.

    customer is broadcast (dim); orders⋈lineitem shuffles once on the
    order key.  Deterministic top-n: revenue desc then o_orderkey asc.
    """
    cust = F.broadcast(
        customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    )
    revenue = exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(topn)
    )


def q5_local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier share
    the nation.  All four dims broadcast; the two fact tables join on the
    order key (one shuffle), then the supplier condition is an equi-join
    on (l_suppkey, c_nationkey=s_nationkey) against a broadcast dim.
    """
    nat = F.broadcast(
        nation.join(
            F.broadcast(region.where(F.col("r_name") == region_name)),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    cust = F.broadcast(
        customer.join(nat, customer.c_nationkey == nat.n_nationkey).select(
            "c_custkey", "c_nationkey", "n_name"
        )
    )
    supp = F.broadcast(supplier.select("s_suppkey", "s_nationkey"))
    revenue = exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(
            supp,
            (lineitem.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )


def q6_forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: revenue change from discount elimination.  Pure
    filter + global aggregate — every predicate sits on a scan column, so
    the whole WHERE reaches the parquet reader as PushedFilters and the
    scan prunes row groups before any Spark work."""
    revenue = exact_sum(F.col("l_extendedprice") * F.col("l_discount"))
    return lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
        & (F.col("l_discount") >= disc_lo)
        & (F.col("l_discount") <= disc_hi)
        & (F.col("l_quantity") < max_qty)
    ).agg(revenue.alias("revenue"))


def q14_promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    promo_type: str = "ECONOMY",
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from promo-type parts.  The part
    dim broadcasts; lineitem never shuffles.  Both sums are exact-decimal
    (order-independent), divided as doubles in a pinned order so the
    oracle reproduces the rounding bit-for-bit."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == promo_type, disc_price).otherwise(
        F.lit(0.0)
    )
    dec = lambda c: F.sum(c.cast("decimal(30,8)")).cast("double")  # noqa: E731
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.round(100.0 * (dec(promo) / dec(disc_price)), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


def q12_priority_by_flag(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 shape (fixtures lack l_shipmode, so the group key is
    l_returnflag): per flag, how many shipped lines belong to
    high-priority (URGENT/HIGH) vs low-priority orders.  The conditional
    counts are map-side partial aggregates; the orders⋈lineitem join is
    the one honest shuffle (both fact-sized — no broadcast hint; AQE
    decides at runtime)."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_returnflag")
        .join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including zero-order customers (the LEFT join).  Two aggregations:
    per-customer count (shuffle on custkey — both sides fact-sized, no
    hint), then the tiny distribution rollup."""
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q15_top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue.
    Revenue per supplier is one agg shuffle; the global max is a 1-row
    aggregate broadcast back as an equi-condition (never a global sort);
    supplier attaches at the end, when only the winners remain."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    top = F.broadcast(rev.agg(F.max("total_revenue").alias("__max_rev")))
    return (
        rev.join(top, rev.total_revenue == F.col("__max_rev"))
        .join(
            supplier.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#1",
    qty_factor: float = 0.2,
) -> DataFrame:
    """TPC-H Q17 shape: weekly revenue lost if small-quantity orders
    (below 20% of the part's average quantity) for one brand moved to
    bulk.  The correlated scalar subquery decorrelates into a per-part
    aggregate joined back — both sides already filtered to one brand via
    the broadcast part list, so the agg and join touch a sliver of
    lineitem."""
    # No broadcast hint on pk/lim: a single brand is ~1/25 of part, which
    # scales linearly with sf (hundreds of millions of rows at the 100 TB
    # posture) — same discipline as q10/q18's customer side.  AQE converts
    # to broadcast at runtime when the stats allow.
    pk = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(pk, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # Threshold from the exact-decimal mean (not F.avg): a double-sum
    # average differs across engines/partitionings in the last ulp, and a
    # row sitting on the boundary would flip — same discipline as
    # exact_avg, without the rounding.
    lim = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            qty_factor
            * (
                F.sum(F.col("l_quantity").cast("decimal(30,8)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            )
        ).alias("__qty_limit")
    )
    return (
        li.join(lim, F.col("l_partkey") == F.col("__pk"))
        .where(F.col("l_quantity") < F.col("__qty_limit"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjunctive (brand, size,
    quantity) branches.  One equi-join on partkey with the OR residual —
    Catalyst pulls the common l_quantity bounds into the lineitem scan
    as a pushed range filter; the branches stay a codegen residual."""
    p = part.select("p_partkey", "p_brand", "p_size")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        lineitem.where(F.col("l_quantity").between(1, 30))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def q22_global_sales_opportunity(
    customer: DataFrame,
    orders: DataFrame,
    since: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q22 shape (fixtures lack c_phone, so the group key is
    c_nationkey): customers with above-average positive balance and no
    orders since the cutoff (Q22's "7 years" dormancy test).  The global
    average is a 1-row broadcast; the no-recent-orders test is a LEFT
    ANTI join (never NOT IN, which a null key poisons) whose right side
    carries a pushed date filter; per-nation rollup is the only data
    shuffle."""
    # Exact-decimal mean: the cutoff must be bit-identical across
    # engines/partitionings or boundary customers flip membership.
    avg_bal = F.broadcast(
        customer.where(F.col("c_acctbal") > 0).agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(30,8)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("__avg_bal")
        )
    )
    rich = (
        customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .join(avg_bal)
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
    )
    return (
        rich.join(
            orders.where(
                F.col("o_orderdate") >= F.lit(since).cast("timestamp_ntz")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    max_size: int = 15,
    p_type: str = "STANDARD",
) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in one
    region offering the minimum supply cost.  The fixtures carry no
    partsupp table, so the supply relation is derived from lineitem —
    supplycost(part, supp) = MIN unit price ever charged
    (l_extendedprice / l_quantity), a deterministic IEEE selection both
    engines compute bit-identically (division then MIN: no accumulation
    order involved), so the correlated-min equi-match cannot flap.

    Plan shape pinned here: the correlated scalar min decorrelates into a
    per-part aggregate joined back on (partkey, cost == min_cost).  Both
    aggregates hash-partition on l_partkey(+l_suppkey), so the min-join is
    co-partitioned; nation⋈region is a true fixed-cardinality dim (≤25
    rows at any sf) and broadcasts; supplier and the filtered part carry
    NO hints — both scale with sf, AQE promotes them at runtime when
    small (the q10/q18 discipline)."""
    dim_nat = F.broadcast(
        nation.join(
            F.broadcast(region.where(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    ps = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("__cost")
    )
    eps = (
        ps.join(
            supplier.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(dim_nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", "l_suppkey", "__cost", "s_name", "s_acctbal", "n_name")
    )
    mn = eps.groupBy(F.col("l_partkey").alias("__mpk")).agg(
        F.min("__cost").alias("__min_cost")
    )
    pq = part.where(
        (F.col("p_size") <= max_size) & (F.col("p_type") == p_type)
    ).select("p_partkey", "p_type")
    return (
        eps.join(
            mn,
            (F.col("l_partkey") == F.col("__mpk"))
            & (F.col("__cost") == F.col("__min_cost")),
        )
        .join(pq, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            # Round in DECIMAL space (HALF_UP both engines), then double.
            F.round(F.col("__cost").cast("decimal(30,8)"), 4)
            .cast("double")
            .alias("supplycost"),
        )
    )


def q11_important_part_value(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nations: tuple[str, ...] = ("NATION_3", "NATION_7"),
    share_denom: int = 1000,
) -> DataFrame:
    """TPC-H Q11 shape (global-share HAVING): per-part shipped value for
    suppliers in a nation group, keeping parts whose value exceeds
    1/share_denom of the group total.  The global total is a 1-row
    broadcast joined onto the per-part aggregate — never a window, never
    a collect.

    Boundary discipline: both the per-part value and the total are exact
    decimal sums; the share test then runs in DOUBLE on both engines
    (cast-exact-decimal → nearest double, × share_denom, compare), a
    deterministic computation with no accumulation order, so both engines
    agree bit-for-bit on membership."""
    nat = F.broadcast(
        nation.where(F.col("n_name").isin(*nations)).select("n_nationkey")
    )
    supp = supplier.join(
        nat, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    val = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).alias("__v")
        )
    )
    total = val.agg(F.sum("__v").alias("__total"))
    return (
        val.join(F.broadcast(total))
        .where(
            F.col("__v").cast("double") * share_denom
            > F.col("__total").cast("double")
        )
        .select(
            "l_partkey",
            F.round(F.col("__v"), 2).cast("double").alias("part_value"),
        )
    )


def q16_supplier_count(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excl_brand: str = "Brand#1",
    excl_type_prefix: str = "STA",
    sizes: tuple[int, ...] = (1, 4, 7, 10, 13, 16, 19, 22),
    complaint_name_pattern: str = "%7",
) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    for parts outside one brand/type family, excluding "complaint"
    suppliers via NOT IN.  The supply relation is the distinct
    (partkey, suppkey) projection of lineitem (fixtures lack partsupp);
    the complaint set is a name-pattern filter (fixtures lack s_comment).

    The NOT IN compiles to a LEFT ANTI join on the engine side —
    s_suppkey is non-nullable so the semantics are identical, and an anti
    join sidesteps NOT IN's null-poisoning, the engine's standing rule
    (see q22).  The anti join's right side is a filtered dim slice; AQE
    broadcasts it.  The distinct and both joins hash on partkey/suppkey —
    no global exchange anywhere."""
    pl = lineitem.select("l_partkey", "l_suppkey").distinct()
    pq = part.where(
        (F.col("p_brand") != excl_brand)
        & ~F.col("p_type").like(excl_type_prefix + "%")
        & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supplier.where(
        F.col("s_name").like(complaint_name_pattern)
    ).select("s_suppkey")
    return (
        pl.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(pq, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_excess_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    name_prefix: str = "small",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    qty_threshold: int = 60,
) -> DataFrame:
    """TPC-H Q20 shape (nested semi-chain): suppliers who moved more than
    a threshold quantity of name-matched parts inside one year.  Without
    partsupp/availqty the innermost correlated "excess stock" test becomes
    a per-(part, supplier) shipped-quantity HAVING — the chain part-filter
    → grouped lineitem HAVING → supplier LEFT SEMI is preserved.

    The quantity HAVING sums in exact decimal (quantities are
    integer-valued, the > threshold test cannot sit on a float boundary).
    The date filter is pushed to the lineitem scan; the part-name filter
    joins before the aggregate so only matched parts shuffle; the semi
    join's right side is a distinct suppkey set, broadcast by AQE."""
    pk = part.where(F.col("p_name").like(name_prefix + "%")).select("p_partkey")
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp_ntz"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(pk, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,8)")).alias("__q"))
        .where(F.col("__q") > qty_threshold)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )


def q21_waiting_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    late_days: int = 30,
) -> DataFrame:
    """TPC-H Q21 shape (multi-EXISTS): suppliers who were the SOLE late
    shipper on finished multi-supplier orders.  Fixtures lack
    commit/receipt dates, so "late" is l_shipdate > o_orderdate +
    late_days.

    The EXISTS / NOT EXISTS pair decorrelates into one per-order
    aggregate: n_supp = countDistinct(supplier), n_late_supp =
    countDistinct(supplier | late).  A late line l1 qualifies iff
    n_supp > 1 (EXISTS another supplier) and n_late_supp == 1 (l1's
    supplier is late, so exactly-one-late-supplier means NO OTHER late
    supplier — the NOT EXISTS).  One lineitem⋈orders shuffle on orderkey,
    the stats aggregate and the stats join both reuse that partitioning,
    supplier names arrive by AQE-broadcast equi-join: two effective
    exchanges total, versus four correlated subquery rescans in the
    literal SQL form (which the oracle runs, pinning the rewrite's
    equivalence)."""
    o = orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o, F.col("l_orderkey") == F.col("o_orderkey")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {late_days} DAYS"
    )
    stats = l.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias(
            "__n_late_supp"
        ),
    )
    sole_late = (
        l.where(late)
        .join(stats, F.col("l_orderkey") == F.col("__ok"))
        .where((F.col("__n_supp") > 1) & (F.col("__n_late_supp") == 1))
    )
    return (
        sole_late.join(
            supplier.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q7_volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1996-01-01",
    date_to: str = "1997-12-31",
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year, in
    both directions.  The symmetric OR condition ((A→B) | (B→A)) does NOT
    become a join predicate: supplier and customer are each pre-filtered
    to the two nations (broadcast nation dim), the facts join on their
    normal keys, and the OR collapses to a cheap residual
    ``supp_nation != cust_nation`` — so the plan is the standard
    lineitem⋈orders shuffle plus dim lookups, with the nation filter
    pruning both fact sides before the big join.  supplier/customer carry
    no broadcast hints (they scale with sf); AQE promotes the
    nation-filtered slivers at runtime."""
    nat = F.broadcast(
        nation.where(F.col("n_name").isin(nation_a, nation_b)).select(
            "n_nationkey", "n_name"
        )
    )
    supp = (
        supplier.join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        customer.join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("l_shipdate") <= F.lit(date_to).cast("timestamp_ntz"))
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def q8_market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_3",
    region_name: str = "ASIA",
    p_type: str = "STANDARD",
    date_from: str = "1996-01-01",
    date_to: str = "1997-12-31",
) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional market volume per
    order year.  The share is a ratio of two sums over the SAME joined
    rows, so it is one aggregation with a conditional numerator — never
    two scans.  Both sums go through the exact-decimal trick before the
    double division (accumulation-order-stable at any parallelism);
    nation⋈region broadcasts (≤25 rows), part's type filter is a pushed
    scan predicate, customer/supplier carry no hints (q10/q18
    discipline)."""
    buyer_nat = F.broadcast(
        nation.join(
            F.broadcast(region.where(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("__bn"))
    )
    supp_nat = F.broadcast(nation.select("n_nationkey", "n_name"))
    pq = part.where(F.col("p_type") == p_type).select("p_partkey")
    cust = customer.join(
        buyer_nat, F.col("c_nationkey") == F.col("__bn")
    ).select("c_custkey")
    supp = supplier.join(
        supp_nat, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("__supp_nation"))
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("o_orderdate") <= F.lit(date_to).cast("timestamp_ntz"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target_volume = F.when(
        F.col("__supp_nation") == target_nation, volume
    ).otherwise(F.lit(0.0))
    return (
        lineitem.join(pq, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(target_volume.cast("decimal(30,8)")).cast("double")
                / F.sum(volume.cast("decimal(30,8)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


def q9_product_type_profit(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    name_like: str = "%widget%",
) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name pattern.  Fixtures carry no partsupp, so supplycost
    reuses q2's derived relation — MIN unit price ever charged per
    (part, supp), a deterministic IEEE selection both engines compute
    bit-identically.  The cost aggregate and the lineitem side
    hash-partition on the same (l_partkey, l_suppkey) keys, so the
    cost join is co-partitioned; the name-filtered part list and the
    25-row nation dim ride equi-joins (AQE promotes the slivers);
    profit sums via exact decimals."""
    ps = lineitem.groupBy(
        F.col("l_partkey").alias("__pk"), F.col("l_suppkey").alias("__sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("__cost"))
    pq = part.where(F.col("p_name").like(name_like)).select("p_partkey")
    supp = supplier.select("s_suppkey", "s_nationkey")
    nat = F.broadcast(nation.select("n_nationkey", "n_name"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "__cost"
    ) * F.col("l_quantity")
    return (
        lineitem.join(pq, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("l_partkey") == F.col("__pk"))
            & (F.col("l_suppkey") == F.col("__sk")),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(exact_sum(amount).alias("sum_profit"))
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window ranking: top-k orders by total price per customer.
    Single shuffle on o_custkey; per-key sort only (no global sort)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def order_priority_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP over (orderstatus, orderpriority): subtotal lattice in one
    pass — Spark expands grouping sets without rescanning the fact table."""
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice")).alias("total_price"),
    )


def customer_order_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-segment order stats: broadcast dim join + one agg shuffle."""
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum(F.col("o_totalprice")).alias("total_price"),
            exact_avg(F.col("o_totalprice")).alias("avg_price"),
        )
    )


def q4_order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q4 shape: orders per priority that had at least one late
    shipment (fixtures lack commit/receipt dates, so "late" is
    l_shipdate > o_orderdate).  The EXISTS is a LEFT SEMI join — each
    qualifying order counts once no matter how many late lines it has,
    and the lineitem payload never leaves the join.  One shuffle on the
    order key; the quarter filter is a pushed scan predicate on orders,
    and the implied bound l_shipdate > date_from (late ⇒ shipdate >
    orderdate ≥ date_from) is pushed to the lineitem scan so row groups
    prune before the shuffle."""
    in_quarter = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))
    )
    late = in_quarter.join(
        lineitem.where(
            F.col("l_shipdate") > F.lit(date_from).cast("timestamp_ntz")
        ).select("l_orderkey", "l_shipdate"),
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returns in a
    quarter.  nation broadcasts (true dim, 25 rows at any sf); customer
    is fact-sized in TPC-H (sf × 150k rows) so it carries NO broadcast
    hint — the quarter-filtered orders⋈lineitem aggregate is small, and
    AQE picks broadcast at runtime when the stats allow, without the
    hint OOMing a 100 TB run.  The global top-k is a single-partition
    row_number over the (tiny) aggregated frame — deterministic via the
    c_custkey tiebreak."""
    revenue = exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = (
        orders.where(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp_ntz"))
        )
        .join(
            lineitem.where(F.col("l_returnflag") == "R").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "rank")
    )


def q18_large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18 shape: customers with orders above a total-quantity
    threshold.  Aggregate lineitem FIRST (partial→final on l_orderkey),
    filter to the rare big orders, then join the now-tiny result to
    orders/customer — the agg-before-join ordering is what keeps the
    shuffle at O(orders), never O(lineitem × orders).  customer is
    fact-sized in TPC-H (sf × 150k rows), so no broadcast hint on it —
    the post-filter frames are small and AQE converts to broadcast at
    runtime when stats allow, without the hint OOMing at 100 TB."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(exact_sum(F.col("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > min_qty)
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )
