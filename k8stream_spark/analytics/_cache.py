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
