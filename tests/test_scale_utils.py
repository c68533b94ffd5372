"""Scale-utility tests: salted join equivalence, partition pruning in the
physical plan, upsert merge semantics."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from apache_iceberg_spark.operators.scale import salted_join, upsert, write_partitioned
from apache_iceberg_spark.tables import load_table
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").agg(
        F.count("*").alias("n"), F.sum("o_orderkey").alias("s")
    ).collect()[0]
    salted = salted_join(orders, customer, "o_custkey", n_salts=8).agg(
        F.count("*").alias("n"), F.sum("o_orderkey").alias("s")
    ).collect()[0]
    assert plain["n"] == salted["n"] and plain["s"] == salted["s"]


def test_salted_join_spreads_hot_key(spark):
    # one hot key: every left row hits it; salted join must not put them
    # all in one (key, salt) bucket
    left = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    right = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    out = salted_join(left, right, "k", n_salts=8)
    assert out.count() == 1000
    # deterministic: same result twice
    assert out.count() == salted_join(left, right, "k", n_salts=8).count()


def test_partitioned_write_prunes(spark):
    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    target = os.path.join(tempfile.mkdtemp(prefix="part_"), "events_by_day")
    write_partitioned(events, target, ["day"])
    back = spark.read.parquet(target)
    one_day = back.select("day").distinct().limit(1).collect()[0]["day"]
    q = back.filter(F.col("day") == F.lit(one_day))
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filter present and no pushed data filter needed for `day`
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200]
    assert q.count() == events.filter(F.col("day") == F.lit(one_day)).count()


def test_upsert_semantics(spark):
    current = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    updates = spark.createDataFrame([(2, "B"), (4, "d")], ["k", "v"])
    out = {r["k"]: r["v"] for r in upsert(current, updates, "k").collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_upsert_composite_key(spark):
    current = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 20)], ["k1", "k2", "v"]
    )
    updates = spark.createDataFrame([(1, "y", 99), (2, "z", 1)], ["k1", "k2", "v"])
    out = {(r["k1"], r["k2"]): r["v"] for r in upsert(current, updates, ["k1", "k2"]).collect()}
    assert out == {(1, "x"): 10, (1, "y"): 99, (2, "z"): 1}


def test_salted_join_rejects_right_preserving(spark):
    left = spark.range(10).withColumnRenamed("id", "k")
    right = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="duplicate unmatched right"):
            salted_join(left, right, "k", n_salts=4, how=how)
    # left-preserving flavors still accepted
    assert salted_join(left, right, "k", n_salts=4, how="left").count() == 10


def test_dd6_iteration_partitions_derived_from_graph():
    """CC iteration frames size with the measured graph, not a constant
    (VERDICT r1: the hardcoded repartition(1) was a scale-killer)."""
    from apache_iceberg_spark.operators.dedup import iteration_partitions

    # local-scale dup graphs: a handful of tasks
    assert iteration_partitions(0, 32) == 1
    assert iteration_partitions(90, 32) == 1
    # cluster-scale graphs: grows with nodes...
    assert iteration_partitions(10_000_000, 1000) == 5
    assert iteration_partitions(1_000_000_000, 1000) == 500
    # ...but never past the cluster's parallelism
    assert iteration_partitions(10_000_000_000, 1000) == 1000


def test_parse_byte_conf_forms():
    """load_table_parallel must survive every Spark size-conf spelling an
    external session might set (review finding: int('128m') crashed)."""
    from apache_iceberg_spark.tables import _parse_byte_conf

    assert _parse_byte_conf("134217728") == 134217728
    assert _parse_byte_conf("134217728b") == 134217728
    assert _parse_byte_conf("128m") == 128 << 20
    assert _parse_byte_conf("128MB") == 128 << 20
    assert _parse_byte_conf("1g") == 1 << 30
    assert _parse_byte_conf("512kb") == 512 << 10
    assert _parse_byte_conf("garbage") == 134217728  # fallback, no crash
    assert _parse_byte_conf("") == 134217728
    # non-positive sizes would zero-divide the split estimate — fall back
    assert _parse_byte_conf("0") == 134217728
    assert _parse_byte_conf("0m") == 134217728
    assert _parse_byte_conf("-128m") == 134217728
