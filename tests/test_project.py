"""Projection field mapping — mirrors reference handler_test.go:18-62
(makeL9EventDetails field assertions + version stamping) and
event_service.go:72-112 (P10 id synthesis)."""

from __future__ import annotations

from pyspark.sql import functions as F

from k8stream_spark import L9_VERSION
from k8stream_spark.ops import project


def test_p6_field_mapping_and_version(events_df):
    rows = project.l9event_projection(events_df).collect()
    e1 = next(r for r in rows if r.id == "e1" and r.message == "msg")
    assert e1.component == "scheduler"
    assert e1.host == "node-a"
    assert e1.reason == "Scheduled"
    assert e1.reference_uid == "o1"
    assert e1.reference_kind == "Pod"
    assert e1.reference_version == "v1"
    # version stamp mirrors reference main.go:18 / event.go:65
    assert e1.version == L9_VERSION == "0.0.5"
    # epoch seconds of 2024-01-01T00:00:00Z (event.go:52)
    assert e1.timestamp == 1704067200


def test_p10_id_is_uid_dash_resource_version(services_df):
    out = {r.reference_uid: r for r in
           project.service_event_synthesis(services_df).collect()}
    assert out["s1"].id == "s1-10"  # handler.go:96
    assert out["s1"].reason == "addedService"
    assert out["s1"].reference_kind == "Service"
    assert out["s1"].version == L9_VERSION


def test_f_helpers(spark):
    df = spark.createDataFrame([("Events", "U1", "events-U1")],
                               "t string, u string, expect string")
    row = df.select(
        project.cache_key("t", "u").alias("k"),
        project.strip_prefix(F.lit("events-U1"), "events").alias("stripped"),
        project.version_gte(F.lit("9"), F.lit("10")).alias("lex"),
    ).collect()[0]
    assert row.k == "events-U1"
    assert row.stripped == "U1"
    assert row.lex is True  # lexicographic quirk: '9' >= '10'
