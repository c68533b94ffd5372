"""Quickstart — the reference's full user loop on this engine.

Mirrors what a user of `senthilsweb/apache-iceberg` does end-to-end
(bot_iceberg_loader.py CLI + query_iceberg.ipynb analytics), so a
reference user can see every step has a drop-in equivalent here:

1. ingest a CSV into a catalog table (loader pipeline: source dispatch,
   schema inference restricted to the reference's 8-type surface,
   create-or-replace + append semantics, table-name normalization)
2. list namespaces/tables, describe the schema
3. run the flagship analytics shape (GROUP BY → ORDER BY count DESC →
   LIMIT — query_iceberg.ipynb:798-802)
4. export a filtered selection to a single CSV / parquet artifact
   (COPY ... TO shape — query_iceberg.ipynb:1332-1391)

Run:  python examples/quickstart.py  [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(workdir: str | None = None) -> dict:
    from pyspark.sql import functions as F

    from apache_iceberg_spark.catalog.ddl import describe_table, list_tables
    from apache_iceberg_spark.ingest.loader import (
        LoaderConfig,
        csv_to_table_pipeline,
    )
    from apache_iceberg_spark.io.export import export_csv, export_parquet
    from apache_iceberg_spark.session import get_spark

    workdir = workdir or tempfile.mkdtemp(prefix="quickstart_")
    os.makedirs(workdir, exist_ok=True)
    spark = get_spark("quickstart", warehouse=os.path.join(workdir, "wh"))

    # 1. Ingest: a CSV lands as a namespaced table, like the reference CLI.
    csv_path = os.path.join(workdir, "User Event.csv")
    with open(csv_path, "w") as f:
        f.write("user_id,city,likesports\n")
        for i in range(100):
            f.write(f"{i},{'Seattle' if i % 3 else 'Portland'},{i % 2 == 0}\n")
    summary = csv_to_table_pipeline(
        spark,
        LoaderConfig(
            source_path=csv_path, namespace="demo", pluralize_table=True
        ),
    )
    assert summary["exit_code"] == 0, summary
    # "User Event.csv" normalizes + pluralizes to demo.user_events —
    # the reference's resolve_table_name/pluralize_word semantics.
    table = summary["results"][0]["table"]

    # 2. Catalog introspection.
    tables = [t.tableName for t in list_tables(spark, "demo")]
    schema = describe_table(spark, table)

    # 3. Flagship analytics (A2 + O1 + O3).
    top = (
        spark.table(table)
        .groupBy("city")
        .agg(F.count("*").alias("user_count"))
        .orderBy(F.desc("user_count"))
        .limit(10)
    )
    top_rows = [(r.city, r.user_count) for r in top.collect()]

    # 4. Single-file exports of a filtered selection (COPY-TO shape).
    sel = spark.table(table).filter(F.col("likesports") == True)  # noqa: E712
    csv_out = export_csv(sel, os.path.join(workdir, "sports_fans.csv"))
    pq_out = export_parquet(sel, os.path.join(workdir, "sports_fans.parquet"))

    result = {
        "table": table,
        "tables": tables,
        "schema": schema,
        "top": top_rows,
        "csv_artifact": csv_out,
        "parquet_artifact": pq_out,
    }
    for k, v in result.items():
        print(f"{k}: {v}")
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
