"""CDC / MERGE workflow demo — the round-15 merge surface end-to-end
on the emulated snapshot catalog, printing each step's artifact:

1. SEED      — the dimension table commits with key-column stats
2. UPSERT    — a merge-on-read MERGE lands O(batch) bytes: an
               equality-delete key file + an insert delta (m52)
3. SET       — a partial-payload CDC batch updates a COLUMN SUBSET
               (`update_set`, m57)
4. GUARD     — an out-of-order batch applies under
               `WHEN MATCHED AND source is newer` — stale updates
               cannot clobber newer state (m61 / st37's contract)
5. PRUNE     — a narrow range read skips data dirs AND provably
               irrelevant delete files (m56's three proofs)
6. MAINTAIN  — the inventory (m62) + the live-overlap planner (m59)
               decide compact vs hold; `compact_mor` folds the debt

Run:  python examples/cdc_merge_workflow.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    import pyspark.sql.functions as F

    from apache_iceberg_spark.catalog.snapshots import (
        commit_snapshot,
        compact_mor,
        merge_into,
        mor_debt,
        mor_dels_table,
        mor_maintenance_plan,
        read_pruned_detail,
        read_ref,
    )
    from apache_iceberg_spark.session import get_spark

    spark = get_spark("cdc_merge_demo", cpus=4, shuffle_partitions=4)
    out: dict = {}

    # 1. SEED: user -> (balance cents, tier, last update time)
    users = spark.range(0, 1000).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 100).alias("cents"),
        F.lit("std").alias("tier"),
        F.lit(1_000).alias("us"),
    )
    table = os.path.join(tempfile.mkdtemp(prefix="cdc_demo_"), "users")
    commit_snapshot(users, table, stats_cols=["user_id"])
    print(f"1. SEED      {users.count()} users committed with stats")

    # 2. UPSERT (merge-on-read): 100 balance changes + 10 new users
    batch1 = spark.range(950, 1060).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 100 + 7).alias("cents"),
        F.lit("std").alias("tier"),
        F.lit(2_000).alias("us"),
    )
    merge_into(
        spark, table, batch1, on=["user_id"], strategy="mor",
        stats_cols=["user_id"],
    )
    out["debt_after_upsert"] = mor_debt(table)
    print(f"2. UPSERT    O(batch) MoR commit; debt={out['debt_after_upsert']}")

    # 3. SET-clause partial update: a tier-change feed that carries NO
    #    balance — unlisted columns keep the target's values
    tiers = spark.range(0, 50).select(
        F.col("id").alias("user_id"),
        F.lit(-999).alias("cents"),  # bogus — must NOT land
        F.lit("gold").alias("tier"),
        F.lit(3_000).alias("us"),
    )
    merge_into(
        spark, table, tiers, on=["user_id"], strategy="mor",
        when_not_matched="ignore",
        update_set={"tier": "source.tier", "us": "source.us"},
    )
    gold = read_ref(spark, table, "main").filter("tier = 'gold'")
    kept_balance = gold.agg(F.min("cents")).first()[0]
    assert kept_balance >= 0, "SET clause leaked the bogus balance!"
    print(f"3. SET       50 tier updates; balances kept (min={kept_balance})")

    # 4. GUARDED apply: a STALE replay (older us) must change nothing
    stale = spark.range(0, 50).select(
        F.col("id").alias("user_id"),
        F.lit(-1).alias("cents"),
        F.lit("stale").alias("tier"),
        F.lit(500).alias("us"),  # older than everything
    )
    before = read_ref(spark, table, "main")
    n_gold_before = before.filter("tier = 'gold'").count()
    merge_into(
        spark, table, stale, on=["user_id"], strategy="mor",
        when_not_matched="ignore",
        matched_condition="source.us > target.us",
    )
    n_gold_after = (
        read_ref(spark, table, "main").filter("tier = 'gold'").count()
    )
    assert n_gold_after == n_gold_before, "stale replay clobbered state!"
    print(f"4. GUARD     stale replay applied 0 rows (gold={n_gold_after})")

    # 5. PRUNED read: a narrow key range skips provably irrelevant
    #    delete files along with the data dirs
    _df, d = read_pruned_detail(spark, table, "user_id", 0, 10)
    out["prune_ledger"] = d
    print(f"5. PRUNE     ledger={d}")

    # 6. MAINTENANCE: inventory -> decision -> compact
    inv = mor_dels_table(table)
    plan = mor_maintenance_plan(table, debt_threshold=3)
    print(f"6. MAINTAIN  {len(inv)} delete files, decision={plan['decision']}")
    if plan["decision"] == "compact":
        compact_mor(spark, table)
    out["debt_final"] = mor_debt(table)
    out["n_rows_final"] = read_ref(spark, table, "main").count()
    print(
        f"   COMPACT   debt={out['debt_final']}, "
        f"rows={out['n_rows_final']}"
    )
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
