"""Cache-lifecycle helper for compute-heavy, small-output operators.

The house persist contract (``remove_duplicate_spans`` docstring) lets
callers release intermediates with ``spark.catalog.clearCache()``
between queries — the oracle gate and bench do.  But a long-lived
session running many queries back to back (the bench loop shape, or a
notebook) accumulates cached blocks from every operator that persists
internals and returns a lazy frame.  For operators whose OUTPUT is
small relative to their cached intermediates (edge lists, per-doc
stats, vocab tables), the fix is to eagerly materialize the output and
release the intermediates before returning.

``localCheckpoint`` rather than ``persist`` for the output: the
checkpoint RDD is dropped by Spark's ContextCleaner once the caller
releases the returned frame (GC-tracked), whereas CacheManager entries
live until an explicit unpersist/clearCache.  Laziness is deliberately
broken at this boundary — these operators are compute-heavy enough
that no caller-side pushdown through them ever wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Escape hatch for plan introspection: ``scripts/plan_audit.py`` flips
#: this to False so the operators return their LAZY plan (a checkpointed
#: output is just an RDD scan — nothing to audit) with the intermediates
#: left persisted, i.e. exactly the pre-finalize behavior.  Production
#: and bench paths leave it True.
EAGER = True


#: Iterative-fixpoint plan capture (r10 task 4 / r11 verdict item 4):
#: the CI plan gate executes every non-iterative query's returned
#: frame, but a driver-loop engine's returned frame is the
#: post-fixpoint tail — an inner-iteration regression (say, a lost
#: broadcast in the CC label-exchange join) would ship invisible.
#: When a test arms this with a list, the loop engines append
#: (family, executedPlan string) for ONE representative inner
#: iteration per family; production leaves it None (zero overhead —
#: one ``is None`` check per iteration).
PLAN_CAPTURE: list[tuple[str, str]] | None = None


def capture_iteration_plan(family: str, df: DataFrame) -> None:
    """Record ``df``'s executed plan under ``family`` when capture is
    armed.  Call AFTER the frame has executed (post-localCheckpoint /
    post-collect) so the string is the AQE FINAL plan.  First call per
    family wins — one representative iteration is the contract."""
    if PLAN_CAPTURE is None:
        return
    if any(f == family for f, _ in PLAN_CAPTURE):
        return
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:  # pragma: no cover — introspection best-effort
        return
    PLAN_CAPTURE.append((family, plan))


def finalize(out: DataFrame, *caches: DataFrame) -> DataFrame:
    """Materialize ``out`` eagerly (localCheckpoint), then unpersist
    every frame in ``caches``.  Returns the checkpointed frame — safe
    to consume any number of times with zero recompute and zero
    lingering CacheManager entries."""
    if not EAGER:
        return out
    out = out.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out
