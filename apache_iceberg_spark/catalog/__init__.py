"""Catalog / DDL / maintenance surface (SURVEY.md §2.10)."""

from apache_iceberg_spark.catalog.ddl import (
    compact_table,
    create_namespace,
    describe_table,
    drop_namespace,
    drop_table,
    list_namespaces,
    list_tables,
    table_location,
    wipe_warehouse,
)

__all__ = [
    "create_namespace",
    "drop_namespace",
    "list_namespaces",
    "list_tables",
    "describe_table",
    "table_location",
    "drop_table",
    "compact_table",
    "wipe_warehouse",
]
