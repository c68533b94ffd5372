"""Catalog, DDL, and table-maintenance operators (SURVEY.md §2.10 C1-C14).

The reference drives these through PyIceberg catalog RPCs
(bot_iceberg_loader.py:245-301, clean_r2_warehouse.py); here they are Spark
catalog statements, so the same code runs against the built-in catalog in
dev and an Iceberg REST/JDBC catalog in production (session.py wires the
catalog when the runtime jar is present — C1/C2 are pure configuration).

Iceberg-only operations (snapshots, time travel, expire-snapshots) raise
``IcebergUnavailableError`` when no Iceberg catalog is configured rather
than failing obscurely.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Row, SparkSession

from apache_iceberg_spark.session import ICEBERG_CATALOG, _iceberg_jar_available


class IcebergUnavailableError(RuntimeError):
    """Raised for snapshot/time-travel ops without an Iceberg runtime."""


# --- namespaces (C3, C7) ----------------------------------------------------


def create_namespace(spark: SparkSession, namespace: str) -> None:
    """Idempotent namespace creation (reference tolerates 'already exists',
    bot_iceberg_loader.py:420-427)."""
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")


def drop_namespace(spark: SparkSession, namespace: str, cascade: bool = False) -> None:
    spark.sql(
        f"DROP NAMESPACE IF EXISTS {namespace}" + (" CASCADE" if cascade else "")
    )


def list_namespaces(spark: SparkSession) -> list[str]:
    return [r[0] for r in spark.sql("SHOW NAMESPACES").collect()]


def list_tables(spark: SparkSession, namespace: str | None = None) -> list[Row]:
    """C7/C9: table listing; temp views carry isTemporary=True (the
    reference sees registered Arrow tables as VIEW in information_schema,
    query_iceberg.ipynb:1489-1491)."""
    if namespace:
        return spark.sql(f"SHOW TABLES IN {namespace}").collect()
    return spark.sql("SHOW TABLES").collect()


# --- tables (C4, C5, C6, C8) -----------------------------------------------


def drop_table(spark: SparkSession, identifier: str, purge: bool = False) -> None:
    """C4: ignore-missing drop (reference: bot_iceberg_loader.py:287-292)."""
    spark.sql(f"DROP TABLE IF EXISTS {identifier}" + (" PURGE" if purge else ""))


def describe_table(spark: SparkSession, identifier: str) -> list[tuple[str, str]]:
    """C8: (column_name, column_type) pairs like the reference's DESCRIBE
    (query_iceberg.ipynb:527-528)."""
    return [(f.name, f.dataType.simpleString()) for f in spark.table(identifier).schema]


def rename_table(spark: SparkSession, old: str, new: str) -> None:
    """Table RENAME passthrough (round 14): the documented Nessie
    endpoint matrix lists rename alongside the CRUD rows
    (blog-zero-cost-data-lakehouse.md:345-371). On the session catalog
    this is the one-statement metadata move; the history-preserving
    emulated twin is ``workspace.ws_rename_table`` (m53)."""
    spark.sql(f"ALTER TABLE {old} RENAME TO {new}")


def create_view(
    spark: SparkSession, name: str, sql: str, replace: bool = False
) -> None:
    """Named-VIEW create passthrough (Nessie's view endpoints,
    blog-zero-cost-data-lakehouse.md:345-371). Versioned, ref-aware
    views live in ``workspace.ws_create_view``; this is the session-
    catalog spelling."""
    stmt = "CREATE OR REPLACE VIEW" if replace else "CREATE VIEW"
    spark.sql(f"{stmt} {name} AS {sql}")


def drop_view(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP VIEW IF EXISTS {name}")


def list_views(spark: SparkSession, namespace: str | None = None) -> list[Row]:
    if namespace:
        return spark.sql(f"SHOW VIEWS IN {namespace}").collect()
    return spark.sql("SHOW VIEWS").collect()


def table_location(spark: SparkSession, identifier: str) -> str | None:
    """C6: physical location introspection (DESCRIBE EXTENDED)."""
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {identifier}").collect():
        if row[0].strip().lower() == "location":
            return row[1]
    return None


# --- maintenance (C10 + north-star compaction) ------------------------------


def wipe_warehouse(
    spark: SparkSession,
    namespace: str,
    confirm: Callable[[str], bool],
) -> list[str]:
    """C10: drop every table in a namespace. Mirrors the reference's
    double-confirmation UX (clean_r2_warehouse.py:52-99): ``confirm`` is
    called twice — once with the table inventory, once with a final
    warning — and both must return True."""
    tables = [r.tableName for r in list_tables(spark, namespace)]
    if not tables:
        return []
    inventory = f"{len(tables)} tables in {namespace}: {', '.join(sorted(tables))}"
    if not confirm(inventory):
        return []
    if not confirm(f"FINAL WARNING: permanently delete all data in {namespace}?"):
        return []
    for t in tables:
        drop_table(spark, f"{namespace}.{t}", purge=True)
    return tables


def compact_table(
    spark: SparkSession,
    identifier: str,
    target_file_rows: int | None = None,
    target_partitions: int | None = None,
) -> int:
    """Small-file compaction — the DataFrame equivalent of Iceberg's
    rewrite_data_files (BASELINE.json north star: "compaction via
    DataFrame operations").

    Read → repartition to the target layout → stage → atomic swap via
    rename (overwriting a table being read is illegal in Spark). Returns
    the resulting partition/file count. At 100 TB run per-partition with
    a WHERE clause so only small-file partitions rewrite.
    """
    df = spark.table(identifier)
    if target_partitions is None:
        total = df.count()
        target_partitions = max(1, -(-total // (target_file_rows or 1_000_000)))
    staged = f"{identifier}__compact_stage"
    spark.sql(f"DROP TABLE IF EXISTS {staged}")
    df.repartition(target_partitions).write.format("parquet").saveAsTable(staged)
    drop_table(spark, identifier)
    spark.sql(f"ALTER TABLE {staged} RENAME TO {identifier}")
    return target_partitions


# --- Iceberg-only surface (S6-S8, snapshots) --------------------------------


def _require_iceberg() -> None:
    if not _iceberg_jar_available():
        raise IcebergUnavailableError(
            "Iceberg Spark runtime jar not on classpath; snapshot/time-travel "
            f"operations need the '{ICEBERG_CATALOG}' catalog (session.py wires "
            "it automatically when iceberg-spark-runtime is installed)."
        )


def read_snapshot(
    spark: SparkSession,
    identifier: str,
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
) -> DataFrame:
    """Time-travel read (S6/S7 + snapshot lineage, SURVEY.md §1.1):
    ``VERSION AS OF`` / ``TIMESTAMP AS OF`` via Iceberg read options."""
    _require_iceberg()
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    if as_of_timestamp is not None:
        reader = reader.option("as-of-timestamp", str(as_of_timestamp))
    return reader.load(identifier)


def expire_snapshots(spark: SparkSession, identifier: str, older_than_ms: int) -> None:
    """Iceberg maintenance: expire_snapshots procedure."""
    _require_iceberg()
    spark.sql(
        f"CALL {ICEBERG_CATALOG}.system.expire_snapshots("
        f"table => '{identifier}', "
        f"older_than => TIMESTAMP '1970-01-01 00:00:00' + INTERVAL {older_than_ms} MILLISECOND)"
    )
