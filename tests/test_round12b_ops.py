"""Round-12b operators: independent cross-checks against pandas/numpy/
pure-Python reimplementations (the oracle gate proves Spark==DuckDB;
these prove both match the textbook definition), plus the joint-cell
quantization gate's invariants.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def test_a40_matches_pandas_rank_pearson(spark, duck):
    got = {
        r["l_returnflag"]: (r["n_rows"], r["spearman_rho"])
        for r in REGISTRY["a40_spearman_rho"].spark(spark, SF_DIR).collect()
    }
    df = duck.execute(
        "SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y "
        "FROM lineitem"
    ).fetch_df()
    for g, sub in df.groupby("g"):
        rx = sub["x"].rank(method="average")
        ry = sub["y"].rank(method="average")
        want = rx.corr(ry)  # Pearson on average ranks == Spearman
        n, rho = got[g]
        assert n == len(sub)
        assert rho == pytest.approx(want, rel=1e-12)


def test_a41_matches_bruteforce_cell_pairs(spark, duck):
    row = REGISTRY["a41_kendall_tau_b"].spark(spark, SF_DIR).collect()[0]
    cells = duck.execute(
        "SELECT CAST(ROUND(l_quantity) AS BIGINT), l_linenumber, COUNT(*) "
        "FROM lineitem GROUP BY 1, 2"
    ).fetchall()
    c = d = 0
    for i, (x1, y1, n1) in enumerate(cells):
        for x2, y2, n2 in cells[i + 1 :]:
            if (x1 - x2) * (y1 - y2) > 0:
                c += n1 * n2
            elif (x1 - x2) * (y1 - y2) < 0:
                d += n1 * n2
    n = sum(n for _, _, n in cells)
    from collections import defaultdict

    mx, my = defaultdict(int), defaultdict(int)
    for x, y, cn in cells:
        mx[x] += cn
        my[y] += cn
    tx = sum(v * (v - 1) // 2 for v in mx.values())
    ty = sum(v * (v - 1) // 2 for v in my.values())
    n0 = n * (n - 1) // 2
    want = (c - d) / (math.sqrt(n0 - tx) * math.sqrt(n0 - ty))
    assert row["n_rows"] == n
    assert row["concordant"] == float(c)
    assert row["discordant"] == float(d)
    assert row["tau_b"] == pytest.approx(want, rel=1e-12)


def test_tx26_matches_pure_python(spark, duck):
    got = {
        r["lang"]: r
        for r in REGISTRY["tx26_token_entropy"].spark(spark, SF_DIR).collect()
    }
    docs = duck.execute("SELECT lang, text FROM documents").fetchall()
    per_lang: dict[str, Counter] = {}
    for lang, text in docs:
        toks = re.split(r"\s+", text.strip().lower())
        per_lang.setdefault(lang, Counter()).update(toks)
    m = 1_000_000
    for lang, cnts in per_lang.items():
        n = sum(cnts.values())
        vocab = len(cnts)
        slnc = sum(c * round(math.log(c) * m) for c in cnts.values())
        h = (n * round(math.log(n) * m) - slnc) // n
        eff = h * m // round(math.log(vocab) * m) if vocab > 1 else 0
        assert got[lang]["n_tokens"] == n
        assert got[lang]["vocab"] == vocab
        assert got[lang]["entropy_micro_nats"] == h
        assert got[lang]["efficiency_ppm"] == eff


def test_snap_cell_axis_gate_bounds_support_and_conserves_mass(spark):
    import pyspark.sql.functions as F

    from apache_iceberg_spark.operators.analytics import _snap_cell_axis

    cells = spark.range(5000).select(
        (F.col("id") * 7919).alias("xv"),  # 5000 distinct, wide span
        (F.col("id") % 3).alias("yv"),
        F.lit(2).alias("cnt"),
    )
    snapped, step = _snap_cell_axis(
        cells, "xv", max_support=1_000, grid=64
    )
    assert step > 1
    ndv = snapped.select("xv").distinct().count()
    assert ndv <= 64
    # mass conserved, other axis untouched
    assert (
        snapped.agg(F.sum("cnt")).collect()[0][0]
        == cells.agg(F.sum("cnt")).collect()[0][0]
    )
    assert snapped.select("yv").distinct().count() == 3
    # under the threshold: identity, step 1
    same, step1 = _snap_cell_axis(cells, "yv", max_support=1_000, grid=64)
    assert step1 == 1 and same is cells


def test_st24_bitwise_equals_batch_recompute(spark):
    """The stream's Spearman must be bitwise-equal to a batch recompute
    over the same events through the SAME _a40_finish (st21/st22's
    pinned-twin contract)."""
    import pyspark.sql.functions as F

    from apache_iceberg_spark.operators.analytics import _a40_finish
    from apache_iceberg_spark.tables import load_table

    got = sorted(
        REGISTRY["st24_stream_rank_correlation"].spark(spark, SF_DIR).collect()
    )
    cells = (
        load_table(spark, SF_DIR, "events")
        .select(
            F.col("event_type").alias("g"),
            F.hour(F.col("ts")).cast("long").alias("xv"),
            F.round(F.col("value") * 100).cast("long").alias("yv"),
        )
        .groupBy("g", "xv", "yv")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = sorted(_a40_finish(cells, "event_type").collect())
    assert got == want
