"""Interleaved cross-worktree A/B for batch queries (r15 opt round).

BENCH_NOISE.md pins the problem: same-code isolated bench_subset mins
can swing 2x BETWEEN sessions minutes apart on a drifting box (r15
measured docs_dedup_minhash_lsh 6.345 -> 3.003 on identical bytes five
minutes apart), so a single HEAD-vs-reference comparison adjudicates
box state, not code.  This harness alternates whole bench_subset
SUBPROCESS invocations A B A B ... (A = repo root, B = a worktree of
the comparison commit), each invocation min-of-$SPARK_GRAFT_BENCH_REPS
in its own session, and reports per-variant min and median across
rounds.  Slow drift (minutes-scale) hits both variants symmetrically;
per-session luck is bounded by the min over rounds.

Usage:
  python scripts/ab_worktree.py --b /tmp/wt_ref [--rounds 3] q1 q2 ...
Prints one JSON line:
  {"a": {q: min}, "b": {q: min}, "a_med": {...}, "b_med": {...}}
"""
from __future__ import annotations

import json
import os
import subprocess
import sys


def run_once(root: str, names: list[str]) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "bench_subset.py"),
         *names],
        cwd=root,
        capture_output=True,
        text=True,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["queries"]


def main() -> None:
    args = sys.argv[1:]
    b_root = None
    rounds = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--b":
            b_root = args[i + 1]
            i += 2
        elif args[i] == "--rounds":
            rounds = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    a_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if b_root is None:
        raise SystemExit("--b <worktree> is required")

    a_runs: list[dict[str, float]] = []
    b_runs: list[dict[str, float]] = []
    for r in range(rounds):
        for tag, root, acc in (("A", a_root, a_runs), ("B", b_root, b_runs)):
            res = run_once(root, names)
            acc.append(res)
            print(f"round {r} {tag}: {res}", file=sys.stderr)

    def agg(runs: list[dict[str, float]], f) -> dict[str, float]:
        return {
            q: round(f([r[q] for r in runs]), 3)
            for q in names
        }

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(json.dumps({
        "rounds": rounds,
        "a": agg(a_runs, min), "b": agg(b_runs, min),
        "a_med": agg(a_runs, med), "b_med": agg(b_runs, med),
    }))


if __name__ == "__main__":
    main()
