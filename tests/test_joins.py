"""Enrichment joins J1-J5 + A1 — reference event.go:33-77,
k8sclient.go:76-159, event_service.go:10-96.  Pins the null/empty-array
edge semantics and the empty-selector-matches-all case (SURVEY §7.4)."""

from __future__ import annotations

import json

from k8stream_spark.ops import joins


def test_j1_unmatched_ref_uid_yields_nulls(events_df, objects_df):
    out = joins.enrich_involved_object(events_df, objects_df)
    by_uid = {r.uid: r for r in out.collect()}
    assert by_uid["e1"].obj_name == "pod-1"
    assert by_uid["e4"].obj_uid is None  # ref_uid='missing' → cache-miss path
    assert out.count() == events_df.count()  # left join never drops


def test_j2_empty_host_gets_empty_array_not_null(events_df, nodes_df):
    out = joins.node_addresses(events_df, nodes_df)
    by_uid = {r.uid: r for r in out.collect()}
    assert by_uid["e1"].address == ["10.1.1.1", "fe80::1"]
    assert by_uid["e4"].address == []  # reference k8sclient.go:98-100
    assert by_uid["e4"].address is not None


def test_j3_pod_fields_only_for_pods(events_df, objects_df):
    out = joins.conditional_pod_enrich(
        joins.enrich_involved_object(events_df, objects_df)
    )
    by_uid = {r.uid: r for r in out.collect()}
    assert by_uid["e1"].pod_name == "pod-1"  # obj kind Pod
    assert by_uid["e1"].pod_ip == "10.0.0.1"
    assert by_uid["e3"].pod_name is None  # Deployment → no pod enrich
    assert by_uid["e4"].pod_name is None  # unmatched


def test_j4_label_selector_containment(services_df, pods_df):
    pairs = {
        (r.service_uid, r.pod_uid)
        for r in joins.label_selector_join(services_df, pods_df).collect()
    }
    # s1 {app:web} → p1,p2 ; s3 {app:web,tier:fe} → p1 only ; s5 → none
    assert ("s1", "p1") in pairs and ("s1", "p2") in pairs
    assert ("s1", "p3") not in pairs
    assert ("s3", "p1") in pairs and ("s3", "p2") not in pairs
    assert not any(s == "s5" for s, _ in pairs)
    # s2 empty selector matches ALL pods (k8sclient.go:78-81 — empty
    # selector string lists everything)
    assert {p for s, p in pairs if s == "s2"} == {"p1", "p2", "p3"}


def test_j4_empty_selector_strict_mode(services_df, pods_df):
    pairs = joins.label_selector_join(
        services_df, pods_df, empty_selector_matches_all=False
    ).collect()
    assert not any(r.service_uid == "s2" for r in pairs)


def test_j5_reverse_index_multi_service_pod(services_df, pods_df):
    pairs = joins.label_selector_join(services_df, pods_df)
    idx = {r.pod_uid: r.service_uids for r in
           joins.pod_service_reverse_index(pairs).collect()}
    # p1 is behind s1, s2 and s3 (the multi-service race the reference
    # notes at event_service.go:26-28)
    assert idx["p1"] == ["s1", "s2", "s3"]
    assert idx["p3"] == ["s2"]


def test_a1_service_pod_map(services_df, pods_df):
    pairs = joins.label_selector_join(services_df, pods_df)
    out = {r.service_uid: r.pod for r in
           joins.service_pod_map(pairs, pods_df).collect()}
    assert set(out["s1"].keys()) == {"pod-1", "pod-2"}
    info = json.loads(out["s1"]["pod-1"])
    assert info["uid"] == "p1" and info["ip"] == "10.0.0.1"


def test_a1_sharded_equals_unsharded_union(services_df, pods_df):
    """service_pod_map_sharded: the union of a service's shard maps is
    exactly the unsharded reference-semantics map, every shard holds at
    most shard_size entries, and shard ids are dense from 0."""
    pairs = joins.label_selector_join(services_df, pods_df)
    full = {r.service_uid: r.pod for r in
            joins.service_pod_map(pairs, pods_df).collect()}
    shards: dict[str, dict] = {}
    seen_ids: dict[str, list] = {}
    for r in joins.service_pod_map_sharded(
        pairs, pods_df, shard_size=2
    ).collect():
        assert len(r.pod) <= 2, (r.service_uid, r.shard_id)
        shards.setdefault(r.service_uid, {}).update(r.pod)
        seen_ids.setdefault(r.service_uid, []).append(r.shard_id)
    assert shards == full
    for suid, ids in seen_ids.items():
        assert sorted(ids) == list(range(len(ids))), (suid, ids)
    # s2 (empty selector -> all 3 pods) must split into 2 shards at
    # shard_size=2; the first shard takes the name-ordered first 2
    assert len(seen_ids["s2"]) == 2


def test_a1_sharded_validates_args(services_df, pods_df):
    """ADVICE r14: preshards <= 0 would make the modulo yield
    null/invalid __ps and silently corrupt ranks and shard ids —
    fail fast instead.  None args prove the check precedes any
    DataFrame work."""
    import pytest

    for bad in (0, -1):
        with pytest.raises(ValueError, match="preshards"):
            joins.service_pod_map_sharded(None, None, preshards=bad)
    with pytest.raises(ValueError, match="shard_size"):
        joins.service_pod_map_sharded(None, None, shard_size=0)


def test_a1_sharded_rank_window_is_presharded(services_df, pods_df):
    """r14 task 4 (VERDICT r13): the row_number window must be
    partitioned by (service_uid, __ps), not service_uid alone, so a
    mega-service's rank sort spreads across pre-shard tasks instead of
    streaming through one."""
    pairs = joins.label_selector_join(services_df, pods_df)
    df = joins.service_pod_map_sharded(pairs, pods_df, shard_size=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    rank_windows = [
        ln for ln in plan.splitlines()
        if "row_number()" in ln and "windowspecdefinition" in ln
    ]
    assert rank_windows, plan
    for ln in rank_windows:
        spec = ln.split("windowspecdefinition(", 1)[1]
        assert "__ps" in spec.split("ASC")[0], ln


def test_a1_stats_equal_map_derived_panel(services_df, pods_df):
    """r16 (VERDICT r15 item 6): the narrow stats operators must equal
    the (size, first-key) panel derived from the map operators — the
    declared a1 contract — on every service and shard, including the
    empty-selector service that matches all pods."""
    pairs = joins.label_selector_join(services_df, pods_df)
    from_map = {
        r.service_uid: (len(r.pod), sorted(r.pod.keys())[0])
        for r in joins.service_pod_map(pairs, pods_df).collect()
    }
    from_stats = {
        r.service_uid: (r.n_pods, r.first_pod)
        for r in joins.service_pod_stats(pairs, pods_df).collect()
    }
    assert from_stats == from_map
    sh_map = {
        (r.service_uid, r.shard_id): (len(r.pod), sorted(r.pod.keys())[0])
        for r in joins.service_pod_map_sharded(
            pairs, pods_df, shard_size=2
        ).collect()
    }
    sh_stats = {
        (r.service_uid, r.shard_id): (r.n_pods, r.first_pod)
        for r in joins.service_pod_shard_stats(
            pairs, pods_df, shard_size=2
        ).collect()
    }
    assert sh_stats == sh_map


def test_u1_union_fills_missing_columns(spark):
    a = spark.createDataFrame([("1", "x")], "id string, only_a string")
    b = spark.createDataFrame([("2", "y")], "id string, only_b string")
    out = joins.union_streams(a, b)
    assert out.count() == 2
    assert set(out.columns) == {"id", "only_a", "only_b"}


def test_j4_selective_anchor_picks_rare_entry(spark):
    """With a deliberately skewed leading selector key (matches 80% of
    pods) and a rare second key (matches 1), the selective anchor drives
    the join through the rare entry — and output stays correct."""
    from pyspark.sql import functions as F

    pods = spark.createDataFrame(
        [(f"p{i}", {"seg": "hot", "app": f"app-{i}"}) for i in range(8)]
        + [(f"q{i}", {"seg": "cold"}) for i in range(2)],
        "uid string, labels map<string,string>",
    )
    services = spark.createDataFrame(
        [("s1", {"seg": "hot", "app": "app-3"})],
        "uid string, selector map<string,string>",
    )

    # Anchor choice: the rare (app, app-3) entry (1 pod), not (seg, hot)
    # (8 pods) — checked via the helper the join uses.
    from k8stream_spark.ops.joins import _selective_anchor

    svc = services.select(
        F.col("uid").alias("service_uid"), F.col("selector").alias("__sel")
    ).where(F.size("__sel") > 0)
    pod_kv = pods.select(
        F.col("uid").alias("pod_uid"),
        F.col("labels").alias("__lab"),
        F.explode("labels").alias("__k", "__v"),
    )
    a = _selective_anchor(svc, pod_kv, stats_fraction=1.0).collect()[0]
    assert (a["__k"], a["__v"]) == ("app", "app-3")

    got = {
        (r.service_uid, r.pod_uid)
        for r in joins.label_selector_join(services, pods).collect()
    }
    assert got == {("s1", "p3")}


def test_j4_anchor_modes_agree(services_df, pods_df):
    """anchor="first" and anchor="selective" produce identical pairs —
    the anchor only shapes candidate generation, never the output."""
    sel = {
        (r.service_uid, r.pod_uid)
        for r in joins.label_selector_join(
            services_df, pods_df, anchor="selective"
        ).collect()
    }
    first = {
        (r.service_uid, r.pod_uid)
        for r in joins.label_selector_join(
            services_df, pods_df, anchor="first"
        ).collect()
    }
    assert sel == first


def test_j4_precomputed_label_freqs(services_df, pods_df):
    """A persisted pod_label_frequencies table skips the inline stats
    pass and yields identical pairs — the amortized form a repeated
    caller (streaming enrichment, bench loop) should use."""
    freqs = joins.pod_label_frequencies(pods_df, fraction=1.0).persist()
    try:
        with_stats = {
            (r.service_uid, r.pod_uid)
            for r in joins.label_selector_join(
                services_df, pods_df, label_freqs=freqs
            ).collect()
        }
        inline = {
            (r.service_uid, r.pod_uid)
            for r in joins.label_selector_join(services_df, pods_df).collect()
        }
        assert with_stats == inline
    finally:
        freqs.unpersist()


def test_j4_randomized_brute_force_oracle(spark):
    """Property sweep (VERDICT r4 #8): ~250 random selector configs x ~80
    random pod label maps, including NULL/empty selectors, NULL/empty
    label maps, and selector keys absent from every pod.  Expected pairs
    come from a pure-Python containment brute force; the join must agree
    EXACTLY under both anchor modes and both empty-selector semantics.
    Seeded RNG -> deterministic; one Spark job per variant, not one per
    example, so the sweep stays fast."""
    import random

    rng = random.Random(20260813)
    keys = ["app", "tier", "env", "seg", "zone"]
    vals = ["a", "b", "c", "d"]

    def rand_map(max_n):
        if rng.random() < 0.15:
            return None  # NULL selector / NULL labels edge
        n = rng.randint(0, max_n)  # 0 → empty map edge
        return {k: rng.choice(vals) for k in rng.sample(keys, n)}

    pods = []
    for i in range(80):
        labels = rand_map(4)
        pods.append((f"p{i}", labels))
    services = []
    for i in range(250):
        sel = rand_map(3)
        # sprinkle selectors with a key no pod ever carries
        if rng.random() < 0.1:
            sel = dict(sel or {})
            sel["ghost"] = rng.choice(vals)
        services.append((f"s{i}", sel))

    pods_df = spark.createDataFrame(
        pods, "uid string, labels map<string,string>"
    )
    services_df = spark.createDataFrame(
        services, "uid string, selector map<string,string>"
    )

    def brute(empty_matches_all):
        out = set()
        for suid, sel in services:
            if not sel:  # None or {}
                if empty_matches_all:
                    out.update((suid, puid) for puid, _ in pods)
                continue
            for puid, labels in pods:
                lab = labels or {}
                if all(lab.get(k) == v for k, v in sel.items()):
                    out.add((suid, puid))
        return out

    for anchor in ("selective", "first"):
        for empty_all in (True, False):
            got = {
                (r.service_uid, r.pod_uid)
                for r in joins.label_selector_join(
                    services_df,
                    pods_df,
                    anchor=anchor,
                    anchor_stats_fraction=1.0,
                    empty_selector_matches_all=empty_all,
                ).collect()
            }
            want = brute(empty_all)
            assert got == want, (
                f"anchor={anchor} empty_all={empty_all}: "
                f"extra={sorted(got - want)[:5]} missing={sorted(want - got)[:5]}"
            )
