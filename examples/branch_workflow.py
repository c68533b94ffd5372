"""Branch/tag workflow demo — the Nessie-style git-for-data loop
end-to-end on the emulated ref layer (SURVEY §2.11; reference surface:
blog-zero-cost-data-lakehouse.md:373-397), printing each step's artifact:

1. BRANCH   — main holds the serving table; an ingest branch forks it
              (metadata-only) and takes isolated commits (m29)
2. AUDIT    — branch-WAP: a14's data-contract gates run against ONLY the
              branch's delta files; publish = fast-forward merge iff
              green, reject = one ref deletion (m30)
3. TAG      — an immutable audit tag pins the pre-merge state forever
4. STREAM   — a real micro-batch stream commits snapshot-per-batch onto
              a branch, published atomically after the run (st19)
5. TRAVEL   — the pre-merge state stays addressable by tag and version

Run:  python examples/branch_workflow.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    import pyspark.sql.functions as F

    from apache_iceberg_spark.catalog.snapshots import (
        commit_append_ref,
        commit_snapshot,
        create_branch,
        create_tag,
        delete_branch,
        list_refs,
        list_snapshots,
        merge_branch,
        read_incremental,
        read_ref,
    )
    from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
    from apache_iceberg_spark.session import get_spark
    from apache_iceberg_spark.tables import load_table

    _ensure_loaded()
    spark = get_spark("branch-workflow", cpus=8)
    out: dict = {}

    print("== 1. branch: fork main, commit in isolation (m29) ==")
    o = load_table(spark, sf_dir, "orders")
    table = os.path.join(tempfile.mkdtemp(prefix="bw_"), "orders")
    v1 = commit_snapshot(o.filter(F.col("o_orderkey") % 5 != 0), table)
    create_branch(table, "etl")
    create_tag(table, "pre_ingest")
    v2 = commit_append_ref(
        o.filter(F.col("o_orderkey") % 10 == 5), table, branch="etl"
    )
    n_main = read_ref(spark, table, "main").count()
    n_etl = read_ref(spark, table, "etl").count()
    print(f"  main sees {n_main} rows; branch etl sees {n_etl} (isolated)")
    out["isolation"] = n_etl > n_main

    print("== 2. audit the branch delta, then publish (m30 shape) ==")
    staged = read_incremental(spark, table, from_version=v1, to_version=v2)
    bad = staged.filter(F.col("o_totalprice") <= 0).count()
    print(f"  audit over {staged.count()} staged rows: {bad} violations")
    if bad == 0:
        merge_branch(table, "etl")
        print("  gates green -> fast-forward merge published the batch")
    else:  # pragma: no cover - fixture prices are positive
        delete_branch(table, "etl")
        print("  gates red -> branch abandoned, main untouched")
    out["published"] = read_ref(spark, table, "main").count() == n_etl

    print("== 3. the tag still serves the PRE-merge state ==")
    n_tag = read_ref(spark, table, "pre_ingest").count()
    print(f"  tag pre_ingest: {n_tag} rows (== pre-merge main: {n_main})")
    out["tag_immutable"] = n_tag == n_main

    print("== 4. streaming ingest onto a branch (st19) ==")
    agg = REGISTRY["st19_stream_branch_ingest"].spark(spark, sf_dir)
    total = agg.agg(F.sum("n_events")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    print(
        f"  4 micro-batches committed on branch, merged once: "
        f"{total} rows == events table {n_events}"
    )
    out["stream_atomic"] = total == n_events

    print("== 5. refs + log ==")
    refs = list_refs(table)
    log = list_snapshots(table)
    print(f"  branches={refs['branches']} tags={refs['tags']}")
    print(f"  {len(log)} commits in the log; every one time-travelable")
    out["n_commits"] = len(log)

    print("== 6. @ref addressing + the history table (round 12) ==")
    # Nessie's reference syntax: one string names (table, branch/tag) —
    # read_at routes through the same metadata-only resolution.
    from apache_iceberg_spark.catalog.snapshots import read_at

    base_dir = os.path.dirname(table)
    name = os.path.basename(table)
    n_at_tag = read_at(spark, base_dir, f"{name}@pre_ingest").count()
    print(f"  read_at('{name}@pre_ingest') -> {n_at_tag} rows")
    out["at_ref_sugar"] = n_at_tag == n_tag
    # The table's own history as a DataFrame (Iceberg's t.snapshots) —
    # operation classified from the commit-entry shape, O(log) driver
    # work. A long-lived branch needs no manual compact_log call:
    # commits auto-fold the segment at max(256 KiB, base/4), and keyed
    # streaming sinks pass keys_max so the ref file stays O(1) too.
    ops = [(e["version"], "overwrite" if "path" in e else
            ("append" if "adds" in e else "restate")) for e in log]
    print(f"  history: {ops[:6]}{' ...' if len(ops) > 6 else ''}")
    return out


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
