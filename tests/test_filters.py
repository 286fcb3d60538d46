"""Eligibility truth table (SURVEY.md §5) — mirrors reference
handler.go:71-93,126-140 semantics."""

from __future__ import annotations

from k8stream_spark.ops import filters


def uids(df):
    return sorted(r.uid for r in df.select("uid").collect())


def test_namespace_blacklist_drops_system_namespaces(events_df):
    out = filters.namespace_blacklist(events_df)
    assert "e2" not in uids(out)  # kube-system
    assert "e1" in uids(out)


def test_namespace_whitelist_empty_passes_all(events_df):
    # reference handler.go:134: len(cfg)==0 || contains(...)
    assert filters.namespace_whitelist(events_df, ()).count() == events_df.count()


def test_namespace_whitelist_filters(events_df):
    out = filters.namespace_whitelist(events_df, ("prod",))
    assert uids(out) == ["e5"]


def test_reason_whitelist(events_df):
    out = filters.reason_whitelist(events_df, ("Pulled", "Created"))
    assert uids(out) == ["e3", "e5"]


def test_eligibility_conjunction(events_df):
    out = filters.eligible_events(events_df, reasons=("Scheduled",))
    # e2 is kube-system (dropped even though reason matches nothing here);
    # e1 (x2) and e4 are Scheduled in allowed namespaces
    assert uids(out) == ["e1", "e1", "e4"]


def test_drop_default_service(services_df):
    out = filters.drop_default_service(services_df)
    names = sorted(r.name for r in out.collect())
    assert "kubernetes" not in names  # reference handler.go:90-92
    assert len(names) == 4


def test_eligible_services_composition(services_df):
    out = filters.eligible_services(services_df, namespaces=("default",))
    ids = sorted(r.uid for r in out.collect())
    assert ids == ["s1", "s2", "s3"]  # s4 is 'kubernetes', s5 is prod
