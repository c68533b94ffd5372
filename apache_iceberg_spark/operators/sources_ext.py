"""Source/sink round-trip operators: JSONL and CSV.

The reference ingests CSV only (SURVEY.md §2.1 S1-S4); a training-data
pipeline also speaks JSONL (the lingua franca of LLM corpora). These
queries prove the write→read path is lossless for every column type by
round-tripping `documents` through a temp directory and letting the
oracle compare the result against the original table.

Scale notes: both writers produce one file per partition (full write
parallelism); the read back is a normal multi-split scan. The temp dir is
driver-local here; at scale the path is object storage.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_spark.registry import register
from apache_iceberg_spark.tables import load_table

_DOC_ORACLE = "SELECT doc_id, text, lang, source, n_chars FROM documents"
_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@register(
    "s13_jsonl_roundtrip",
    oracle=_DOC_ORACLE,
    doc="JSONL sink → source round trip of the documents table (schema "
    "pinned on read so types survive; JSON string escaping must be "
    "lossless for arbitrary text). Oracle compares against the original "
    "rows — any encode/decode drift fails the hash.",
    tags=("source", "sink", "json"),
)
def s13_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    path = os.path.join(tempfile.mkdtemp(prefix="jsonl_rt_"), "docs")
    d.write.mode("overwrite").json(path)
    return spark.read.schema(d.schema).json(path).select(*_DOC_COLS)


@register(
    "s14_csv_roundtrip",
    oracle=_DOC_ORACLE,
    doc="CSV sink → source round trip of the documents table with the "
    "loader's read options (header, multiLine for embedded newlines, "
    "pinned schema — SURVEY.md §1.3). Proves quoting/escaping is "
    "lossless in both directions, the property the reference's "
    "newlines_in_values=True read depends on.",
    tags=("source", "sink", "csv"),
)
def s14_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    path = os.path.join(tempfile.mkdtemp(prefix="csv_rt_"), "docs")
    d.write.mode("overwrite").option("header", True).option("escape", '"').csv(path)
    return (
        spark.read.schema(d.schema)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
        .select(*_DOC_COLS)
    )
