"""Single-file export sinks, matching the reference's ``COPY … TO`` shape
(S9 csv with header, S10 parquet — query_iceberg.ipynb:1332-1336,
1388-1391).

``COPY TO`` produces exactly one file at an exact path; Spark writes a
directory of parts. These helpers coalesce to one partition and move the
part file to the requested path — correct for export-sized results. For
TB-scale exports use ``df.write`` directly (many parts, full parallelism):
a single output file is inherently single-writer and does not scale.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def _single_file_write(df: DataFrame, path: str, fmt: str, **options) -> str:
    out_dir = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(out_dir, exist_ok=True)
    staging = tempfile.mkdtemp(prefix="export_", dir=out_dir)
    staged = os.path.join(staging, "out")
    try:
        df.coalesce(1).write.format(fmt).options(**options).save(staged)
        parts = glob.glob(os.path.join(staged, f"part-*"))
        if len(parts) != 1:
            raise RuntimeError(f"expected 1 part file, found {len(parts)}")
        if os.path.exists(path):
            os.remove(path)
        shutil.move(parts[0], path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return path


def export_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> str:
    """S9: ``COPY (SELECT …) TO 'f.csv' (HEADER, DELIMITER ',')``."""
    return _single_file_write(df, path, "csv", header=str(header).lower(), sep=sep)


def export_parquet(df: DataFrame, path: str) -> str:
    """S10: ``COPY (SELECT …) TO 'f.parquet' (FORMAT PARQUET)``."""
    return _single_file_write(df, path, "parquet")


def export_jsonl(df: DataFrame, path: str) -> str:
    """S-family JSONL twin: ``COPY (SELECT …) TO 'f.jsonl'`` — one JSON
    object per line, the interchange format raw LLM-corpus drops use
    (s20 reads it; this writes it). Same single-writer caveat as the
    CSV/parquet exports."""
    return _single_file_write(df, path, "json")
