"""Multi-table atomic publish demo — the workspace commit layer
end-to-end (VERDICT r9 ask #2; Nessie's catalog-level commits,
blog-zero-cost-data-lakehouse.md:373-397), printing each step's
artifact:

1. PUBLISH  — customer + orders land as ONE workspace commit: readers
              of any version see both tables' new state or neither
              (m34); a per-table store would expose a torn window
2. TAG      — 'release' pins the cross-table state by name
3. DRIFT    — a later single-table orders append moves latest, the tag
              still serves the consistent pair
4. GC       — an expiry-style audit: every version resolves a
              consistent pair (the invariant st20 streams against)
5. RETRY    — re-publishing with the same idempotency key is a no-op

Run:  python examples/workspace_workflow.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    import pyspark.sql.functions as F

    from apache_iceberg_spark.catalog.workspace import (
        ws_commit,
        ws_create_tag,
        ws_list_tables,
        ws_list_versions,
        ws_read,
    )
    from apache_iceberg_spark.session import get_spark
    from apache_iceberg_spark.tables import load_table

    spark = get_spark("workspace_workflow")
    ws = os.path.join(tempfile.mkdtemp(prefix="ws_demo_"), "warehouse")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    # 1. one ATOMIC two-table publish
    v1 = ws_commit(
        ws,
        {
            "customer": c.filter(F.col("c_custkey") % 2 == 0),
            "orders": o.filter(F.col("o_orderkey") % 2 == 0),
        },
        idempotency_key="publish-2024-01",
    )
    print(f"1. PUBLISH  v{v1} tables={ws_list_tables(ws)}")

    # 2. pin it
    ws_create_tag(ws, "release", version=v1)
    print(f"2. TAG      release -> v{v1}")

    # 3. latest drifts, the tag does not
    v2 = ws_commit(ws, {"orders": o.filter(F.col("o_orderkey") % 2 == 1)})
    n_tag = ws_read(spark, ws, "orders", ref="release").count()
    n_head = ws_read(spark, ws, "orders").count()
    print(f"3. DRIFT    v{v2}: orders@release={n_tag} orders@latest={n_head}")

    # 4. the invariant: every version is a consistent cross-table state
    for e in ws_list_versions(ws):
        v = e["version"]
        pair = {
            t: ws_read(spark, ws, t, version=v).count()
            for t in ws_list_tables(ws, version=v)
        }
        print(f"4. AUDIT    v{v}: {pair}")

    # 5. a retried publish (same key) is a no-op
    v_retry = ws_commit(
        ws,
        {"customer": c.limit(1), "orders": o.limit(1)},
        idempotency_key="publish-2024-01",
    )
    n_versions = len(ws_list_versions(ws))
    print(f"5. RETRY    key publish-2024-01 -> v{v_retry} "
          f"(still {n_versions} commits)")
    assert v_retry == v1 and n_versions == 2
    return {"v1": v1, "v2": v2, "tag_orders": n_tag, "head_orders": n_head}


if __name__ == "__main__":
    main(*sys.argv[1:2])
