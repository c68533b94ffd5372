"""C11: SQLite catalog direct read (SURVEY.md §2.10).

The reference's MinIO notebook resolves a table's current metadata file by
querying the JDBC/SQLite catalog database directly —
``SELECT metadata_location FROM iceberg_tables WHERE table_namespace = ?
AND table_name = ?`` (``query_iceberg_minio.ipynb:108-124``), plus an
all-tables listing (``query_iceberg_minio.ipynb:204-212``) — a debug
utility that avoids hardcoding metadata-file UUIDs.

This module reproduces that surface against the standard Iceberg JDBC
catalog layout (the ``iceberg_tables`` table the JDBC catalog maintains).
The reads are deliberately driver-side ``sqlite3``: a catalog holds a few
rows of metadata, and this is exactly what the reference does — the only
correct use of a driver-side read in this engine. The listing is returned
as a Spark DataFrame so it composes with the SQL surface.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession

# The Iceberg JDBC catalog's table layout (public Iceberg JdbcCatalog DDL).
_CATALOG_DDL = """
CREATE TABLE IF NOT EXISTS iceberg_tables (
    catalog_name TEXT NOT NULL,
    table_namespace TEXT NOT NULL,
    table_name TEXT NOT NULL,
    metadata_location TEXT,
    previous_metadata_location TEXT,
    PRIMARY KEY (catalog_name, table_namespace, table_name)
)
"""


def create_catalog_db(path: str) -> None:
    """Create (idempotently) the JDBC-catalog table layout in a SQLite db."""
    with sqlite3.connect(path) as conn:
        conn.execute(_CATALOG_DDL)


def register_table(
    path: str,
    namespace: str,
    table_name: str,
    metadata_location: str,
    catalog_name: str = "ice",
) -> None:
    """Point ``namespace.table_name`` at a metadata location (upsert; the
    previous location is retained the way the JDBC catalog's commit
    swap does)."""
    with sqlite3.connect(path) as conn:
        conn.execute(_CATALOG_DDL)
        # the conflict clause performs the commit swap atomically: the
        # existing metadata_location becomes previous_metadata_location
        conn.execute(
            "INSERT INTO iceberg_tables (catalog_name, table_namespace, "
            "table_name, metadata_location, previous_metadata_location) "
            "VALUES (?, ?, ?, ?, NULL) "
            "ON CONFLICT(catalog_name, table_namespace, table_name) "
            "DO UPDATE SET previous_metadata_location = "
            "iceberg_tables.metadata_location, metadata_location = ?",
            (catalog_name, namespace, table_name, metadata_location,
             metadata_location),
        )


def get_metadata_location(path: str, namespace: str, table_name: str) -> str:
    """The reference's ``get_metadata_location`` semantics
    (``query_iceberg_minio.ipynb:108-124``): current metadata file for a
    table, ``ValueError`` if the table is not in the catalog."""
    with sqlite3.connect(path) as conn:
        row = conn.execute(
            "SELECT metadata_location FROM iceberg_tables "
            "WHERE table_namespace = ? AND table_name = ?",
            (namespace, table_name),
        ).fetchone()
    if row is None:
        raise ValueError(f"Table {namespace}.{table_name} not found in catalog")
    return row[0]


def list_catalog_tables(spark: SparkSession, path: str) -> DataFrame:
    """All-tables listing (``query_iceberg_minio.ipynb:204-212``) as a
    Spark DataFrame: (table_namespace, table_name, metadata_location)."""
    with sqlite3.connect(path) as conn:
        rows = conn.execute(
            "SELECT table_namespace, table_name, metadata_location "
            "FROM iceberg_tables ORDER BY table_namespace, table_name"
        ).fetchall()
    return spark.createDataFrame(
        rows or [],
        "table_namespace string, table_name string, metadata_location string",
    )
