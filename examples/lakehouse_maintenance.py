"""Lakehouse-maintenance demo — the Iceberg-shaped table-service loop
end-to-end on plain parquet snapshots, printing each service's artifact:

1. INSPECT  — partition metadata from parquet FOOTERS only (m19) and
              metadata-only aggregates proven equal to a data scan (m23)
2. MEASURE  — clustering-depth report: is a rewrite worth it? (m26)
3. REWRITE  — Z-order clustering + box-pruned read-back (m8)
4. MUTATE   — three-clause MERGE with deletes (m9) and the CDC diff a
              downstream consumer reads instead of the table (m27)
5. EXPIRE   — snapshot expiry keeping the newest N (m22) and orphan-file
              cleanup (m21)

Run:  python examples/lakehouse_maintenance.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
    from apache_iceberg_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("lakehouse-maintenance", cpus=8)
    q = lambda name: REGISTRY[name].spark(spark, sf_dir)  # noqa: E731
    out: dict = {}

    print("== 1. inspect (m19 footer partitions, m23 metadata-only aggs) ==")
    parts = q("m19_partitions_metadata").collect()
    print(f"  {len(parts)} partitions described without reading data pages")
    m23 = q("m23_metadata_only_aggregates").collect()
    for r in m23:
        print(
            f"  {r['tbl']}.{r['col']}: n={r['record_count']} "
            f"min={r['min_value']} max={r['max_value']} (footers only)"
        )
    out["n_partitions"] = len(parts)

    print("== 2. measure (m26 clustering-depth report) ==")
    rep = {r["layout"]: r for r in q("m26_clustering_depth_report").collect()}
    for name, r in sorted(rep.items()):
        print(
            f"  {name:10s}: {r['n_files']} files, max overlap depth "
            f"{r['max_depth']} (1 = perfectly clustered)"
        )
    out["hashed_depth"] = rep["hashed"]["max_depth"]

    print("== 3. rewrite (m8 z-order + box-pruned read) ==")
    n_z = q("m8_zorder_clustering").count()
    print(f"  {n_z} rows read back through the 2-D pruned box")
    out["zorder_rows"] = n_z

    print("== 4. mutate (m9 MERGE) and consume the diff (m27 changelog) ==")
    n_v2 = q("m9_merge_with_deletes").count()
    log = q("m27_changelog_scan")
    by_type = {
        r["_change_type"]: r["n"]
        for r in log.groupBy("_change_type").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    print(f"  v2 has {n_v2} rows; changelog: {by_type}")
    out["changelog"] = by_type

    print("== 5. expire (m22 snapshot expiry, m21 orphan cleanup) ==")
    kept = q("m22_snapshot_expiry").count()
    orphans = q("m21_orphan_cleanup").count()
    print(f"  {kept} rows readable after expiry; {orphans} rows in the "
          "post-cleanup audit")
    out["expired_ok"] = kept
    return out


if __name__ == "__main__":
    main(*sys.argv[1:2])
