"""Seeded unit test for bench.py's within-run spread flag (r16,
VERDICT r15 item 3): both r15 pathologies were bimodal WITHIN one run
(healthy min/median, 2.5-8x max) and shipped unflagged.
``spread_flags`` is pure — no Spark session needed."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import spread_flags  # noqa: E402


def test_spread_flags_seeded_pathology():
    # The r15 numbers verbatim: emb_semantic_clusters_lsh ran
    # med 8.15 / max 20.28 on the builder box, docs_containment_pairs
    # med 2.54 / max 21.27 — both MUST flag.
    medians = {
        "emb_semantic_clusters_lsh": 8.15,
        "docs_containment_pairs": 2.54,
        "docs_dedup_clusters": 3.90,
    }
    maxes = {
        "emb_semantic_clusters_lsh": 20.28,
        "docs_containment_pairs": 21.27,
        "docs_dedup_clusters": 4.10,
    }
    assert spread_flags(medians, maxes) == [
        "docs_containment_pairs",
        "emb_semantic_clusters_lsh",
    ]


def test_spread_flags_healthy_run_empty():
    # Worst healthy max/median in the r15 artifact was 1.80
    # (events_sessionize) — below the 2x threshold, no flags.
    medians = {"events_sessionize": 0.654, "q1_pricing_summary": 0.8}
    maxes = {"events_sessionize": 1.177, "q1_pricing_summary": 1.5}
    assert spread_flags(medians, maxes) == []


def test_spread_flags_zero_median_guarded():
    # A sub-ms median rounded to 0.0 must not divide-by-zero or flag.
    assert spread_flags({"f1_lower": 0.0}, {"f1_lower": 0.4}) == []


def test_spread_flags_missing_max_defaults_clean():
    assert spread_flags({"q": 1.0}, {}) == []
