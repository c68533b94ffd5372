"""File-level manifest pruning — Iceberg's core read mechanism, emulated.

An Iceberg read resolves ``metadata.json`` → manifest list → manifests,
where each manifest row carries per-file column bounds (lower/upper), and
plans only the data files whose bounds intersect the query predicate
(SURVEY.md §3.3: "metadata.json → manifest lists → manifests → pruned
parquet splits"). Without ``iceberg-spark-runtime`` on the classpath the
real format is unreachable (README "Iceberg runtime status"), so this
module reproduces the *mechanism* on plain parquet:

- ``write_with_manifest``: range-partition the data by a clustering key
  (so each file owns a narrow key range — Iceberg's sort-order write),
  write parquet, then scan the written files' parquet FOOTERS for
  per-file min/max of the tracked columns → one manifest parquet.
- ``scan_pruned``: read the manifest (a few rows — driver-side by
  design, exactly like a query planner), keep the files whose
  [min, max] intersects the predicate, and build a DataFrame over ONLY
  those files. The engine predicate is still applied for row-level
  exactness — manifest pruning is an I/O optimization, never a
  correctness device.

At 100 TB this is the difference between scanning a table and scanning
the 0.1% of files a date/key predicate touches; the manifest itself
scales as one row per file and is itself a parquet table, queryable and
partitionable like Iceberg's.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

MANIFEST_DIR = "_manifest"


def write_with_manifest(
    df: DataFrame,
    path: str,
    cluster_by: str,
    track_cols: list[str],
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered on ``cluster_by`` into ``n_files`` files and
    build a per-file min/max manifest for ``track_cols``.

    ``repartitionByRange`` gives each output file a disjoint key range —
    the write-side half of pruning (unsorted files all overlap and
    nothing can be skipped). The manifest is computed distributed: one
    pass over the written data grouped by input file name.
    """
    spark = df.sparkSession
    data_dir = os.path.join(path, "data")
    (
        df.repartitionByRange(n_files, F.col(cluster_by))
        .sortWithinPartitions(cluster_by)
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    written = spark.read.parquet(data_dir)
    aggs: list[Column] = []
    for c in track_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    manifest = (
        written.groupBy(F.input_file_name().alias("file_path"))
        .agg(F.count("*").alias("record_count"), *aggs)
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, MANIFEST_DIR)
    )


def scan_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Plan a read of ``col BETWEEN lo AND hi`` through the manifest.

    Returns (dataframe, files_total, files_read). The manifest read is
    driver-side (one row per file — planner-scale metadata, the same
    read Iceberg's planner does); the row-level predicate is re-applied
    by the engine so pruning can only skip I/O, never change results.
    """
    df, total, kept = scan_pruned_box(spark, path, [(col, lo, hi)])
    return df, total, kept


def _bounds_overlap(row, col: str, lo, hi) -> bool:
    mn, mx = row[f"min_{col}"], row[f"max_{col}"]
    if mn is None or mx is None:
        # a file whose tracked stats are NULL (all-NULL column chunk)
        # cannot be ruled out — keep it; the row filter stays exact
        return True
    return not (mx < lo or mn > hi)


def scan_pruned_box(
    spark: SparkSession,
    path: str,
    predicates: list[tuple],
) -> tuple[DataFrame, int, int]:
    """Multi-column box pruning: keep files whose bounds intersect EVERY
    (col, lo, hi) predicate — the m8/Z-order read path, and the general
    form ``scan_pruned`` delegates to. NULL file bounds are kept
    conservatively; an all-pruned plan returns an empty frame with the
    table's schema rather than an unreadable zero-path scan."""
    manifest = spark.read.parquet(os.path.join(path, MANIFEST_DIR))
    rows = manifest.collect()
    keep = [
        r["file_path"]
        for r in rows
        if all(_bounds_overlap(r, c, lo, hi) for c, lo, hi in predicates)
    ]
    df = (
        spark.read.parquet(*keep)
        if keep
        else spark.read.parquet(os.path.join(path, "data")).limit(0)
    )
    cond = None
    for c, lo, hi in predicates:
        p = (F.col(c) >= lo) & (F.col(c) <= hi)
        cond = p if cond is None else (cond & p)
    return df.filter(cond), len(rows), len(keep)
