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
6. DIFF     — per-table change classification between any two states
7. CHERRY   — transplant one multi-table commit onto another branch
8. RETAIN   — truncating expiry + orphan GC (tags survive, history cuts)

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

    # 5. a retried publish (same key) is a no-op — found by the O(1)
    #    key index, not a chain walk (round 11)
    v_retry = ws_commit(
        ws,
        {"customer": c.limit(1), "orders": o.limit(1)},
        idempotency_key="publish-2024-01",
    )
    n_versions = len(ws_list_versions(ws))
    print(f"5. RETRY    key publish-2024-01 -> v{v_retry} "
          f"(still {n_versions} commits)")
    assert v_retry == v1 and n_versions == 2

    # 6. DIFF (round 11): what changed across ALL tables, one call —
    #    the returned dir lists are the minimal catch-up scan plan
    from apache_iceberg_spark.catalog.workspace import (
        ws_diff,
        ws_expire_versions,
        ws_remove_orphans,
        ws_transplant,
    )

    diff = ws_diff(ws, v1, "main")
    print(
        "6. DIFF     v%d -> main: %s"
        % (v1, {t: d["change"] for t, d in diff.items()})
    )
    assert diff["orders"]["change"] == "appended"

    # 7. TRANSPLANT (round 11): cherry-pick ONE multi-table commit onto
    #    another branch without its siblings
    from apache_iceberg_spark.catalog.workspace import ws_create_branch

    ws_create_branch(ws, "fix", from_ref="release")
    v_fix = ws_commit(
        ws,
        {"customer": c.filter(F.col("c_custkey") % 2 == 1)},
        branch="fix",
    )
    v3 = ws_transplant(ws, v_fix, onto="main")
    n_cust = ws_read(spark, ws, "customer").count()
    print(f"7. CHERRY   v{v_fix}@fix -> main as v{v3} (customer={n_cust})")

    # 8. RETENTION (round 11): the streaming maintenance triple —
    #    truncating expiry + orphan GC keep a long-lived workspace flat
    expired = ws_expire_versions(
        ws, older_than_ms=10**15, keep_last=2, truncate_history=True
    )
    orphans = ws_remove_orphans(ws)
    print(
        f"8. RETAIN   expired={expired} orphans={len(orphans)} "
        f"versions={len(ws_list_versions(ws))} "
        f"(release tag still pins v{v1})"
    )
    n_tag_after = ws_read(spark, ws, "orders", ref="release").count()
    assert n_tag_after == n_tag  # the tag pin survived truncation
    return {"v1": v1, "v2": v2, "tag_orders": n_tag, "head_orders": n_head}


if __name__ == "__main__":
    main(*sys.argv[1:2])
