"""Export sinks (SURVEY.md §2.1 S9/S10)."""

from apache_iceberg_spark.io.export import export_csv, export_parquet

__all__ = ["export_csv", "export_parquet"]
