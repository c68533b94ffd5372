"""Scale-engineering utilities: skew-resistant joins, partitioned layout,
incremental upsert.

These are the operational pieces a 100 TB deployment needs around the
query surface (SURVEY.md §7 phase 4 scale notes):

- ``salted_join``: shuffle-key salting for joins whose key distribution is
  pathologically skewed (one hot key overwhelming a single reducer). AQE's
  skew-join split handles sort-merge joins on its own; salting is the
  explicit fallback for the shapes AQE can't split (e.g. followed by a
  same-key aggregation) and documents the technique.
- ``write_partitioned``: date/bucket-partitioned parquet layout so readers
  prune partitions (the Iceberg ``days(ts)``/``bucket(n, key)`` layout,
  reproduced on plain parquet paths).
- ``upsert``: key-based merge of an updates batch into a table — the
  incremental-load semantics the reference's blog defers to Iceberg
  ("incremental loads with snapshot isolation",
  blog-zero-cost-data-lakehouse-part-2.md:327). With an Iceberg catalog
  this becomes MERGE INTO; the DataFrame form here is engine-portable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the left side's hot keys spread over
    ``n_salts`` shuffle partitions.

    Left rows get a deterministic salt from their full row hash; the right
    side is replicated ``n_salts``× with every salt value, so each
    (key, salt) shuffle bucket holds 1/n_salts of a hot key's rows.
    Deterministic (no rand()): re-running a failed task reproduces the
    same salt, which speculative execution requires.

    Cost model: right side is replicated n_salts× — use when
    |right| * n_salts ≪ |left|'s hot-key row count; at 100 TB prefer
    AQE skew splitting first and salting only for agg-after-join shapes.
    """
    left_cols = [c for c in left.columns]
    right_cols = [c for c in right.columns if c != key]
    salted_left = left.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in left_cols]), F.lit(n_salts))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("__salt")
    salted_right = right.select(F.col(key), *right_cols, salts)
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Write a date/key-partitioned parquet layout (hive-style directories)
    so readers prune partitions: a filter on a partition column becomes a
    directory listing, not a scan. The plain-parquet analog of Iceberg's
    ``partitionedBy(days(ts), bucket(n, key))`` table spec."""
    df.write.partitionBy(*partition_by).mode(mode).parquet(path)


def upsert(
    current: DataFrame,
    updates: DataFrame,
    key: str | list[str],
) -> DataFrame:
    """Merge ``updates`` into ``current`` by key: updated rows replace,
    new rows append (last-writer-wins MERGE semantics).

    Plan shape: one LEFT ANTI join on the key (kept rows) + union — both
    sides shuffle once on the key; with both tables bucketed on the key
    the anti join is co-located and shuffle-free. Equivalent to
    ``MERGE INTO t USING u ON t.k = u.k WHEN MATCHED THEN UPDATE *
    WHEN NOT MATCHED THEN INSERT *`` on an Iceberg catalog.
    """
    keys = [key] if isinstance(key, str) else list(key)
    kept = current.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)


# --- registered query: MERGE semantics under the oracle gate ---------------

from pyspark.sql import SparkSession  # noqa: E402

from apache_iceberg_spark.registry import register  # noqa: E402
from apache_iceberg_spark.tables import load_table  # noqa: E402


@register(
    "m1_upsert_merge",
    oracle="""
        WITH updates AS (
            SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 10 = 0
            UNION ALL
            SELECT o_orderkey + 10000000, o_custkey, 'N' AS o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 1000 = 0
        )
        SELECT * FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        UNION ALL
        SELECT * FROM updates
    """,
    doc="MERGE INTO semantics (update-matched + insert-new) as a dataflow: "
    "a synthetic update batch (status flip for every 10th order, new "
    "rows cloned past the key space) merged by upsert() — LEFT ANTI on "
    "the key + union, one shuffle each side, co-located when bucketed. "
    "Equivalent to Iceberg MERGE INTO; oracle states the same semantics "
    "with NOT IN + UNION ALL.",
    tags=("merge", "upsert", "incremental"),
)
def m1_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    updated = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
        .select(*cols)
    )
    inserted = (
        o.filter(F.col("o_orderkey") % 1000 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("o_orderstatus", F.lit("N"))
        .select(*cols)
    )
    updates = updated.unionByName(inserted)
    return upsert(o.select(*cols), updates, "o_orderkey")
