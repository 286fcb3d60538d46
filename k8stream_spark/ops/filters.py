"""Eligibility filters P1-P5 (reference handler.go:71-93, 126-140).

Every filter is a declarative ``where`` over a configurable column so
Catalyst pushes the predicate into the scan (PushedFilters on parquet) —
the Spark-native form of the reference's "filter before enrich" hand
optimization (handler.go:137-140, SURVEY.md §4 O1).

Empty-list semantics are the reference's: an unset whitelist passes
everything (handler.go:134 checks ``len(...) == 0 ||``), while the
namespace blacklist always applies (handler.go:80).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference handler.go:12-17 `skipNamespaces`
DEFAULT_NAMESPACE_BLACKLIST: tuple[str, ...] = (
    "kube-system",
    "kubernetes",
    "kubernetes-dashboard",
)

# reference handler.go:90-92: the default `kubernetes` service is dropped.
DEFAULT_SERVICE_NAME = "kubernetes"


def namespace_blacklist(
    df: DataFrame,
    namespaces: Sequence[str] = DEFAULT_NAMESPACE_BLACKLIST,
    col: str = "namespace",
) -> DataFrame:
    """P1 — drop rows whose namespace is blacklisted (handler.go:80,131-133)."""
    if not namespaces:
        return df
    return df.where(~F.col(col).isin(*namespaces))


def _whitelist_pred(col: str, allowed: Sequence[str]) -> Column:
    # Empty whitelist == pass all (handler.go:134 `len(cfg) == 0 || contains`).
    if not allowed:
        return F.lit(True)
    return F.col(col).isin(*allowed)


def namespace_whitelist(
    df: DataFrame, namespaces: Sequence[str] = (), col: str = "namespace"
) -> DataFrame:
    """P2 — if configured, keep only whitelisted namespaces (handler.go:87-88,134)."""
    return df.where(_whitelist_pred(col, namespaces))


def reason_whitelist(
    df: DataFrame, reasons: Sequence[str] = (), col: str = "reason"
) -> DataFrame:
    """P3 — if configured, keep only whitelisted event reasons (handler.go:134)."""
    return df.where(_whitelist_pred(col, reasons))


def drop_default_service(
    df: DataFrame, name: str = DEFAULT_SERVICE_NAME, col: str = "name"
) -> DataFrame:
    """P4 — drop the service literally named ``kubernetes`` (handler.go:90-92)."""
    return df.where(F.col(col) != name)


def eligible_events(
    df: DataFrame,
    namespace_col: str = "namespace",
    reason_col: str = "reason",
    blacklist: Sequence[str] = DEFAULT_NAMESPACE_BLACKLIST,
    namespaces: Sequence[str] = (),
    reasons: Sequence[str] = (),
) -> DataFrame:
    """P5 (events) — P1 ∧ P2 ∧ P3 as one composed predicate
    (handler.go:126-140).  One ``where`` keeps the conjunction a single
    pushed-down filter instead of three plan nodes.
    """
    pred = (
        (~F.col(namespace_col).isin(*blacklist) if blacklist else F.lit(True))
        & _whitelist_pred(namespace_col, namespaces)
        & _whitelist_pred(reason_col, reasons)
    )
    return df.where(pred)


def eligible_services(
    df: DataFrame,
    namespace_col: str = "namespace",
    name_col: str = "name",
    blacklist: Sequence[str] = DEFAULT_NAMESPACE_BLACKLIST,
    namespaces: Sequence[str] = (),
    default_service: str = DEFAULT_SERVICE_NAME,
) -> DataFrame:
    """P5 (services) — P1 ∧ P2 ∧ P4 (handler.go:82-93)."""
    pred = (
        (~F.col(namespace_col).isin(*blacklist) if blacklist else F.lit(True))
        & _whitelist_pred(namespace_col, namespaces)
        & (F.col(name_col) != default_service)
    )
    return df.where(pred)
