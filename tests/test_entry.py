"""Driver-contract smoke: entry() produces rows with a stable schema;
every oracle key has a query; every query runs at sf0.001."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns[0] == "id"
    assert "version" in df.columns


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs
    # documented rows-only exceptions
    assert qs - os_ == {
        "docs_dedup_simhash",
        "emb_cosine_topk_lsh",
        "emb_cosine_topk_ivf",
        "emb_cosine_near_dup_lsh",
        "events_approx_user_counts",
    }


def test_all_queries_run_at_sf0001(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        n = df.count()
        assert n >= 0, name
