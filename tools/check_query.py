"""Ad-hoc differential check: run one registered query on Spark and on
its DuckDB oracle at a given SF dir, print match status and timing.

Usage: python tools/check_query.py <sf_dir> <name> [<name> ...]
Mirrors tests/test_queries_oracle.py's gate (row count + columns +
order-insensitive value hash) at an arbitrary scale factor.
"""

from __future__ import annotations

import glob
import hashlib
import math
import os
import sys
import time

import duckdb

from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
from apache_iceberg_spark.session import get_spark


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _digest(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    _ensure_loaded()
    spark = get_spark("check_query", cpus=32, shuffle_partitions=32)
    duck = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.splitext(os.path.basename(p))[0]
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    rc = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.monotonic()
        sdf = q.spark(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        t_spark = time.monotonic() - t0
        if q.oracle is None:
            print(f"{name}: rows-only ({len(srows)} rows, {t_spark:.2f}s)")
            continue
        t0 = time.monotonic()
        res = duck.execute(q.oracle)
        drows = res.fetchall()
        dcols = [d[0] for d in res.description]
        t_duck = time.monotonic() - t0
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_hash = ok_cols and _digest(srows, scols) == _digest(drows, dcols)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            rc = 1
        print(
            f"{name}: {status} spark={len(srows)} duck={len(drows)} "
            f"rows={ok_rows} cols={ok_cols} hash={ok_hash} "
            f"t_spark={t_spark:.2f}s t_duck={t_duck:.2f}s"
        )
    return rc


if __name__ == "__main__":
    sys.exit(main())
