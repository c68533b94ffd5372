"""Ingestion pipeline: CSV (file / URL / glob) → managed table.

Reproduces the reference loader's semantics (SURVEY.md §2.1 S1-S5, §2.10
C12-C14) on Spark primitives: same naming rules, same source dispatch, same
env-var configuration surface, same create-or-replace table contract — with
the Arrow→Iceberg ingestion step replaced by a distributed Spark write.
"""

from apache_iceberg_spark.ingest.naming import pluralize_word, resolve_table_name
from apache_iceberg_spark.ingest.sources import (
    detect_source_type,
    expand_glob_pattern,
    get_files_to_process,
    is_glob_pattern,
    is_remote_url,
)

__all__ = [
    "resolve_table_name",
    "pluralize_word",
    "is_remote_url",
    "is_glob_pattern",
    "detect_source_type",
    "expand_glob_pattern",
    "get_files_to_process",
]
