"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``apache_iceberg_spark.registry`` (each operator module
registers its Spark implementation next to its DuckDB oracle so the two
cannot drift).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's flagship analytics pattern (A2+O1+O3: GROUP BY →
    ORDER BY count DESC → LIMIT, query_iceberg.ipynb:798-802) applied to
    `customer` — SURVEY.md §7 Phase 0.
    """
    from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    return REGISTRY["o3_topk"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star
    extensions). Each callable takes (spark, sf_dir) → DataFrame."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for non-SQL ops →
    driver records a rows-only check)."""
    return all_oracles()
