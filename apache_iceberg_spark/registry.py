"""Query registry: the single source of truth wiring every implemented
operator to (a) its Spark implementation and (b) its DuckDB oracle SQL.

The driver contract (``__spark_entry__.py``) needs ``queries()`` and
``oracle_sql()`` dicts with matching keys and matching result column names;
this registry keeps both sides adjacent so they cannot drift.

Determinism rules for oracle-checked queries (value-hash compare is exact):
- No LIMIT without a total ORDER BY (ties broken by a unique key).
- No cross-row floating-point aggregation: money sums go through exact
  integer cents (``CAST(ROUND(x*100) AS BIGINT)``) and are scaled back at
  the end; the scaling division is the same op on both sides, so results
  are bitwise identical. min/max/count/sum-of-int are order-insensitive.
- Per-row float math is fine as long as both sides use the identical
  expression tree (IEEE ops on identical inputs are deterministic).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # None → driver runs a weaker rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {name: q.spark for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for their registration side effects.
    from apache_iceberg_spark.operators import (  # noqa: F401
        analytics,
        dedup,
        functions_ext,
        graph,
        multimodal,
        pipeline,
        relational,
        scale,
        similarity,
        sources_ext,
        text,
        timeseries,
        tpch,
        udfs,
    )
    from apache_iceberg_spark.streaming import events  # noqa: F401

    _LOADED = True
