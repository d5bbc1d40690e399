"""Loader/storage routing — the s3routerloader + HTTPLoader-allowlist
analogue, Spark-first.

The reference routes a request's image path to one of several buckets by
prefix (loader/s3routerloader/router.go:41-150) and gates HTTP sources on
an allowed-sources glob list (loader/httploader: BaseURL/AllowedSources →
reject before fetching). Both are per-row *config-driven* decisions over a
tiny routing table, so the Spark shape is a chained ``when/otherwise``
column expression compiled from the config on the driver — zero joins,
zero shuffle, pure codegen on the 10^12-row stream side (a broadcast join
would also work but pays hashing for a table of ~5 rows).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

STATUS_SOURCE_BLOCKED = "source_blocked"  # ≅ httploader 403/ErrSourceNotAllowed


@dataclass(frozen=True)
class Route:
    """One router rule (router.go:41-66): source prefix → storage target."""

    prefix: str
    store: str


def route_expr(routes: list[Route], source_col: str = "source", default: str | None = None) -> Column:
    """First matching prefix wins, in configured order (the reference tries
    loaders/storages in order and the first non-empty result wins,
    imagor.go:699-760). Unrouted rows get ``default`` (or NULL ≅ not found)."""
    expr = F.lit(default).cast("string")
    for r in reversed(routes):
        expr = F.when(F.col(source_col).startswith(r.prefix), F.lit(r.store)).otherwise(expr)
    return expr


def _glob_to_regex(pattern: str) -> str:
    return "^" + re.escape(pattern).replace("\\*", ".*") + "$"


def allowed_sources_expr(patterns: list[str], source_col: str = "source") -> Column:
    """AllowedSources glob gate (httploader semantics): True when the source
    matches ANY pattern; with no patterns everything is allowed (the
    reference's default when -http-loader-allowed-sources is unset)."""
    if not patterns:
        return F.lit(True)
    combined = "|".join(_glob_to_regex(p) for p in patterns)
    return F.col(source_col).rlike(combined)


def resolve_sources(
    df: DataFrame,
    routes: list[Route],
    allowed: list[str] | None = None,
    source_col: str = "source",
) -> DataFrame:
    """Attach ``store`` (routed target, NULL = no route ≅ ErrNotFound) and
    ``source_status`` ('ok' | 'source_blocked' | 'not_found') — quarantine
    decisions made BEFORE any payload is touched, mirroring the reference's
    reject-before-fetch loader chain."""
    out = df.withColumn("store", route_expr(routes, source_col))
    return out.withColumn(
        "source_status",
        F.when(~allowed_sources_expr(allowed or [], source_col), F.lit(STATUS_SOURCE_BLOCKED))
        .when(F.col("store").isNull(), F.lit("not_found"))
        .otherwise(F.lit("ok")),
    )
