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
  write parquet, then read each written file's parquet FOOTER
  (``pyarrow.parquet`` row-group statistics — metadata-only, never the
  data pages) for per-file min/max of the tracked columns → one manifest
  parquet. The footer reads are distributed (``mapInPandas`` over the
  file list), so manifest building is O(files) metadata I/O, not a
  second O(data) scan.
- ``scan_pruned``: filter the manifest *as a DataFrame* with the bounds
  predicates (executor-side, like Iceberg's manifest evaluator) and
  collect only the surviving file paths — the driver never holds
  non-matching files' bounds. The engine predicate is still applied for
  row-level exactness — manifest pruning is an I/O optimization, never
  a correctness device.

At 100 TB this is the difference between scanning a table and scanning
the 0.1% of files a date/key predicate touches; the manifest itself
scales as one row per file and is itself a parquet table, queryable and
partitionable like Iceberg's, and the pruning predicate runs where the
manifest partitions live.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from urllib.parse import urlparse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

MANIFEST_DIR = "_manifest"


def _local_path(uri: str) -> str:
    """file:/-style URI → filesystem path (pass plain paths through)."""
    return urlparse(uri).path if uri.startswith("file:") else uri


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
    nothing can be skipped). The manifest comes from parquet FOOTER
    statistics: a distributed ``mapInPandas`` pass opens each file's
    metadata with pyarrow and folds row-group min/max — no data pages
    are read. A column whose footer lacks usable stats (e.g. truncated
    binary bounds) gets NULL bounds, which ``scan_pruned_box`` keeps
    conservatively.
    """
    spark = df.sparkSession
    data_dir = os.path.join(path, "data")
    (
        df.repartitionByRange(n_files, F.col(cluster_by))
        .sortWithinPartitions(cluster_by)
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    # Listing is planner-scale metadata; the footer reads are distributed.
    files = spark.read.parquet(data_dir).inputFiles()
    fields = [
        StructField("file_path", StringType()),
        StructField("record_count", LongType()),
    ]
    for c in track_cols:
        t = df.schema[c].dataType
        fields.append(StructField(f"min_{c}", t))
        fields.append(StructField(f"max_{c}", t))
    out_schema = StructType(fields)
    col_names = [f.name for f in fields]
    tracked = list(track_cols)

    def footer_stats(batches: Iterator) -> Iterator:
        import datetime

        import pandas as pd
        import pyarrow.parquet as pq

        def to_naive(v):
            # Footer timestamps are absolute (UTC-adjusted); Spark's
            # Arrow bridge expects session-local naive datetimes.
            if isinstance(v, datetime.datetime) and v.tzinfo is not None:
                return v.astimezone().replace(tzinfo=None)
            return v

        for pdf in batches:
            rows = []
            for uri in pdf["file_path"]:
                md = pq.ParquetFile(_local_path(uri)).metadata
                names = [md.schema.column(i).name for i in range(md.num_columns)]
                row = {"file_path": uri, "record_count": md.num_rows}
                for c in tracked:
                    idx = names.index(c)
                    mins, maxs = [], []
                    usable = True
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            usable = False
                            break
                        mins.append(st.min)
                        maxs.append(st.max)
                    row[f"min_{c}"] = to_naive(min(mins)) if usable and mins else None
                    row[f"max_{c}"] = to_naive(max(maxs)) if usable and maxs else None
                rows.append(row)
            yield pd.DataFrame(rows, columns=col_names)

    manifest = (
        spark.createDataFrame([(f,) for f in files], "file_path string")
        .repartition(min(len(files), 32) or 1)
        .mapInPandas(footer_stats, out_schema)
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

    Returns (dataframe, files_total, files_read). Bounds evaluation runs
    on the manifest DataFrame (executor-side); only surviving file paths
    reach the driver. The row-level predicate is re-applied by the
    engine so pruning can only skip I/O, never change results.
    """
    df, total, kept = scan_pruned_box(spark, path, [(col, lo, hi)])
    return df, total, kept


def prune_condition(predicates: list[tuple]) -> F.Column:
    """Manifest-row survival condition for a list of (col, lo, hi) box
    predicates: a file survives when its bounds intersect EVERY box edge,
    and NULL bounds (absent/unusable footer stats) are kept
    conservatively — the expression form of ``Iceberg``'s
    InclusiveMetricsEvaluator."""
    cond = F.lit(True)
    for c, lo, hi in predicates:
        mn, mx = F.col(f"min_{c}"), F.col(f"max_{c}")
        overlap = mn.isNull() | mx.isNull() | ((mx >= F.lit(lo)) & (mn <= F.lit(hi)))
        cond = cond & overlap
    return cond


def scan_pruned_box(
    spark: SparkSession,
    path: str,
    predicates: list[tuple],
) -> tuple[DataFrame, int, int]:
    """Multi-column box pruning: keep files whose bounds intersect EVERY
    (col, lo, hi) predicate — the m8/Z-order read path, and the general
    form ``scan_pruned`` delegates to. The bounds test is a DataFrame
    filter on the manifest (distributed; only survivors' ``file_path``
    values are collected — at 10⁶ files the driver sees the kept list,
    not every file's bounds). An all-pruned plan returns an empty frame
    with the table's schema rather than an unreadable zero-path scan."""
    manifest = spark.read.parquet(os.path.join(path, MANIFEST_DIR))
    total = manifest.count()
    keep = [
        r["file_path"]
        for r in manifest.filter(prune_condition(predicates))
        .select("file_path")
        .collect()
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
    return df.filter(cond), total, len(keep)
