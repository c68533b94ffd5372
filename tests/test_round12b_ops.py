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


def test_ts26_matches_python_ljung_box(spark, duck):
    """Replicate the ACF-from-exact-sums float math and the integer
    Ljung-Box fold in pure Python; q_micro and the decision must match
    exactly (the floats share IEEE op order, the fold is integer)."""
    rows = REGISTRY["ts26_ljung_box"].spark(spark, SF_DIR).collect()
    hourly = dict(
        duck.execute(
            "WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS h0 FROM events)"
            " SELECT date_diff('hour', b.h0, date_trunc('hour', ts)),"
            " COUNT(*) FROM events CROSS JOIN b GROUP BY 1"
        ).fetchall()
    )
    n = max(hourly) + 1
    x = [hourly.get(t, 0) for t in range(n)]
    s1, s2 = sum(x), sum(v * v for v in x)
    mu = s1 / n
    m_ = 1_000_000
    total = 0
    for row in rows:
        k = row["lag"]
        pairs = list(zip(x[:-k], x[k:]))
        sxy = sum(a * c for a, c in pairs)
        sh = sum(a for a, _ in pairs)
        st = sum(c for _, c in pairs)
        mm = len(pairs)
        r = (sxy - mu * (sh + st) + mm * mu * mu) / (s2 - n * mu * mu)
        rk = int(round(r * m_))
        assert row["n_pairs"] == mm and row["rk_micro"] == rk
        total += rk * rk // mm
    q = n * (n + 2) * total // m_
    for row in rows:
        assert row["q_micro"] == q
        assert row["white_at_95"] == (q < 18_307_000)


def test_a42_matches_python_welch(spark, duck):
    got = {
        r["event_type"]: r
        for r in REGISTRY["a42_welch_t"].spark(spark, SF_DIR).collect()
    }
    m = {
        g: (n, s1, s2)
        for g, n, s1, s2 in duck.execute(
            "SELECT event_type, COUNT(*), "
            "SUM(CAST(ROUND(value*100) AS BIGINT)), "
            "SUM(CAST(ROUND(value*100) AS HUGEINT)"
            " * CAST(ROUND(value*100) AS BIGINT)) FROM events GROUP BY 1"
        ).fetchall()
    }
    nt = sum(v[0] for v in m.values())
    s1t = sum(v[1] for v in m.values())
    s2t = sum(v[2] for v in m.values())
    for g, (na, s1a, s2a) in m.items():
        nb, s1b, s2b = nt - na, s1t - s1a, s2t - s2a
        sea = ((s2a - s1a * s1a / na) / (na - 1.0)) / na
        seb = ((s2b - s1b * s1b / nb) / (nb - 1.0)) / nb
        t = (s1a / na - s1b / nb) / math.sqrt(sea + seb)
        df = (sea + seb) ** 2 / (
            sea * sea / (na - 1.0) + seb * seb / (nb - 1.0)
        )
        assert got[g]["n_rows"] == na
        assert got[g]["mean_cents"] == pytest.approx(s1a / na, rel=1e-12)
        assert got[g]["t_stat"] == pytest.approx(t, rel=1e-9)
        assert got[g]["welch_df"] == pytest.approx(df, rel=1e-9)


def test_a42_singleton_group_yields_null_not_inf(spark, tmp_path):
    """ADVICE r12: a group with one row (zero variance denominator) must
    produce NULL t_stat/welch_df, never Inf/NaN — exercised through the
    registered operator on a tiny synthetic events fixture."""
    import pyspark.sql.functions as F

    rows = [(1, "lonely", 1.23), (2, "bulk", 2.0), (3, "bulk", 3.0),
            (4, "bulk", 5.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    df = df.withColumn("ts", F.expr("timestamp_micros(CAST(1700000000000000 + event_id AS LONG))"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["event_type"]: r
        for r in REGISTRY["a42_welch_t"].spark(spark, str(tmp_path)).collect()
    }
    # 'lonely' is the singleton side; 'bulk' has a singleton COMPLEMENT —
    # both must be NULL-guarded
    for g in ("lonely", "bulk"):
        assert out[g]["t_stat"] is None
        assert out[g]["welch_df"] is None
        assert out[g]["mean_cents"] is not None


def test_ts28_matches_python_projection(spark, duck):
    """Recompute the quantized harmonic projections in pure Python from
    the hourly spine; A/B are exact integers so power must match to
    float formula order."""
    rows = {
        r["period_hours"]: r
        for r in REGISTRY["ts28_periodogram"].spark(spark, SF_DIR).collect()
    }
    hourly = dict(
        duck.execute(
            "WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS h0 FROM events)"
            " SELECT date_diff('hour', b.h0, date_trunc('hour', ts)),"
            " COUNT(*) FROM events CROSS JOIN b GROUP BY 1"
        ).fetchall()
    )
    n = max(hourly) + 1
    x = [hourly.get(t, 0) for t in range(n)]
    m = 1_000_000
    for p, row in rows.items():
        c = [round(math.cos(2 * math.pi * (t % p) / p) * m) for t in range(n)]
        s = [round(math.sin(2 * math.pi * (t % p) / p) * m) for t in range(n)]
        a = n * sum(xi * ci for xi, ci in zip(x, c)) - sum(x) * sum(c)
        b = n * sum(xi * si for xi, si in zip(x, s)) - sum(x) * sum(s)
        want = (a * a + b * b) / (n**4 * m * m)
        assert row["n_hours"] == n
        assert row["power"] == pytest.approx(want, rel=1e-9)


def test_st25_bitwise_equals_batch_ts28(spark):
    got = sorted(
        REGISTRY["st25_stream_periodogram"].spark(spark, SF_DIR).collect()
    )
    want = sorted(REGISTRY["ts28_periodogram"].spark(spark, SF_DIR).collect())
    assert [tuple(r) for r in got] == [
        (r["period_hours"], r["n_hours"], r["power"]) for r in want
    ]


def test_ts29_matches_python_km(spark, duck):
    """Pure-Python Kaplan-Meier with identical session/censor rules and
    ln quantization — log_surv_micro and surv_ppm must match exactly."""
    rows = REGISTRY["ts29_kaplan_meier"].spark(spark, SF_DIR).collect()
    evts = duck.execute(
        "SELECT user_id, CAST(EPOCH(ts)*1000000 AS BIGINT), event_id "
        "FROM events ORDER BY user_id, 2, 3"
    ).fetchall()
    gap = 1_800_000_000
    gm = max(us for _, us, _ in evts)
    durs = []
    cur_user, start, last = None, None, None
    for u, us, _ in evts:
        if u != cur_user or us - last > gap:
            if cur_user is not None:
                durs.append((last - start, gm - last > gap))
            cur_user, start = u, us
        last = us
    durs.append((last - start, gm - last > gap))
    per_t: dict[int, list[int]] = {}
    for us_dur, ended in durs:
        t = us_dur // 1_000_000
        d, c = per_t.setdefault(t, [0, 0])
        per_t[t][0 if ended else 1] += 1
    total = sum(d + c for d, c in per_t.values())
    m = 1_000_000
    ls, seen, want = 0, 0, {}
    hit_zero = False
    for t in sorted(per_t):
        d, c = per_t[t]
        n = total - seen
        seen += d + c
        if d == 0:
            continue
        if n == d:
            hit_zero = True
        if not hit_zero:
            ls += round(math.log(n - d) * m) - round(math.log(n) * m)
        want[t] = (
            n,
            d,
            None if hit_zero else ls,
            0 if hit_zero else round(math.exp(ls / m) * m),
        )
    got = {
        r["duration_sec"]: (
            r["n_risk"],
            r["d_ended"],
            r["log_surv_micro"],
            r["surv_ppm"],
        )
        for r in rows
    }
    assert got == want


def test_ts30_matches_python_logrank(spark, duck):
    """Pure-Python log-rank with identical session rules and micro-unit
    integer quantization — oe/var must match exactly, chi2 to formula
    order."""
    row = REGISTRY["ts30_logrank"].spark(spark, SF_DIR).collect()[0]
    evts = duck.execute(
        "SELECT user_id, CAST(EPOCH(ts)*1000000 AS BIGINT), event_id, "
        "event_type FROM events ORDER BY user_id, 2, 3"
    ).fetchall()
    gap = 1_800_000_000
    gm = max(us for _, us, _, _ in evts)
    durs = []
    cur_user = None
    start = last = None
    err = 0
    for u, us, _, et in evts:
        if u != cur_user or us - last > gap:
            if cur_user is not None:
                durs.append(((last - start) // 1_000_000,
                             int(gm - last > gap), err))
            cur_user, start, err = u, us, 0
        last = us
        err = max(err, int(et == "error"))
    durs.append(((last - start) // 1_000_000, int(gm - last > gap), err))
    per_t: dict[int, list[int]] = {}
    for t, ended, has_err in durs:
        e = per_t.setdefault(t, [0, 0, 0, 0])  # d, c, d1, a1
        e[0] += ended
        e[1] += 1 - ended
        e[2] += ended * has_err
        e[3] += has_err
    m = 1_000_000
    tot = sum(v[0] + v[1] for v in per_t.values())
    tot1 = sum(v[3] for v in per_t.values())
    seen = seen1 = 0
    oe = v_sum = ev = 0
    for t in sorted(per_t):
        d, c, d1, a1 = per_t[t]
        n = tot - seen
        n1 = tot1 - seen1
        seen += d + c
        seen1 += a1
        if d == 0:
            continue
        ev += d
        oe += d1 * m - (d * n1 * m) // n
        if n > 1:
            v_sum += (d * n1 * (n - n1) * (n - d) * m) // (n * n * (n - 1))
    assert row["n_sessions"] == len(durs)
    assert row["n_error_sessions"] == sum(h for _, _, h in durs)
    assert row["events_total"] == ev
    assert row["oe_micro"] == oe
    assert row["var_micro"] == v_sum
    assert row["chi2"] == pytest.approx(oe * oe / (v_sum * 1e6), rel=1e-12)
    assert row["significant_at_95"] == (oe * oe / (v_sum * 1e6) > 3.841)


def test_a43_matches_python_poisson_bootstrap(spark, duck):
    """Replicate the deterministic bootstrap in pure Python (hashlib
    md5, the same prequantized Poisson thresholds) — replica means,
    CI bounds, and the point estimate must match exactly."""
    import hashlib

    from apache_iceberg_spark.operators.analytics import (
        A43_MIX_PRIME,
        A43_POISSON_CUM_PPM,
        A43_RANK_HI,
        A43_RANK_LO,
        A43_REPLICAS,
    )

    row = REGISTRY["a43_poisson_bootstrap_ci"].spark(spark, SF_DIR).collect()[
        0
    ]
    evts = duck.execute(
        "SELECT event_id, CAST(ROUND(value*100) AS BIGINT) FROM events"
    ).fetchall()
    m = 1_000_000

    def weight(eid: int, b: int) -> int:
        # round 13: ONE md5 per event, degree-2 lane polynomial mod 2^31-1
        h = hashlib.md5(str(eid).encode()).hexdigest()
        ca, cb, cc = int(h[0:8], 16), int(h[8:16], 16), int(h[16:24], 16)
        u = ((ca + cb * b + cc * b * b) % A43_MIX_PRIME) % m
        for k, t in enumerate(A43_POISSON_CUM_PPM):
            if u < t:
                return k
        return 8

    means = []
    for b in range(A43_REPLICAS):
        sk = sv = 0
        for eid, v in evts:
            k = weight(eid, b)
            sk += k
            sv += k * v
        means.append(sv * m // sk)
    means.sort()
    assert row["n_rows"] == len(evts)
    assert row["b_replicas"] == A43_REPLICAS
    assert row["mean_micro"] == sum(v for _, v in evts) * m // len(evts)
    assert row["ci_lo_micro"] == means[A43_RANK_LO - 1]
    assert row["ci_hi_micro"] == means[A43_RANK_HI - 1]
    assert row["ci_lo_micro"] < row["mean_micro"] < row["ci_hi_micro"]


def test_st26_bitwise_equals_batch_a43(spark):
    got = REGISTRY["st26_stream_bootstrap_ci"].spark(spark, SF_DIR).collect()
    want = REGISTRY["a43_poisson_bootstrap_ci"].spark(spark, SF_DIR).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_g13_matches_python_hits(spark, duck):
    """Integer-exact HITS reimplementation (same micro units, same
    MAX-normalization, same tie-break) — the top lists must match
    exactly."""
    rows = REGISTRY["g13_hits"].spark(spark, SF_DIR).collect()
    pairs = duck.execute(
        "SELECT DISTINCT o_custkey, l_suppkey FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey"
    ).fetchall()
    m = 1_000_000
    a1: dict[int, int] = {}
    for _, s in pairs:
        a1[s] = a1.get(s, 0) + m
    mx = max(a1.values())
    a1n = {s: v * m // mx for s, v in a1.items()}
    h1: dict[int, int] = {}
    for c, s in pairs:
        h1[c] = h1.get(c, 0) + a1n[s]
    mx = max(h1.values())
    h1n = {c: v * m // mx for c, v in h1.items()}
    a2: dict[int, int] = {}
    for c, s in pairs:
        a2[s] = a2.get(s, 0) + h1n[c]
    mx = max(a2.values())
    a2n = {s: v * m // mx for s, v in a2.items()}
    top = 15
    want = sorted(
        (("supplier", s, v) for s, v in a2n.items()),
        key=lambda r: (-r[2], r[1]),
    )[:top] + sorted(
        (("customer", c, v) for c, v in h1n.items()),
        key=lambda r: (-r[2], r[1]),
    )[:top]
    got = {(r["kind"], r["node"], r["score_micro"]) for r in rows}
    assert got == set(want)


def test_a41_dominance_prefix_algebra_on_random_contingencies():
    """The 2D dominance-prefix window algebra (rowcum -> fcum -> two
    LAGs -> P, lx - G -> Q) must equal brute-force pair counting on
    random sparse contingency tables — DuckDB-only, 40 seeded cases,
    validating the algebra independent of the lineitem data."""
    import random

    import duckdb

    con = duckdb.connect()
    rng = random.Random(12012)
    for case in range(40):
        nx = rng.randint(1, 6)
        ny = rng.randint(1, 6)
        cells = {}
        for _ in range(rng.randint(1, 12)):
            cells[(rng.randint(0, nx), rng.randint(0, ny))] = rng.randint(
                1, 9
            )
        vals = ", ".join(f"({x}, {y}, {n})" for (x, y), n in cells.items())
        got = con.execute(f"""
            WITH cells(xv, yv, cnt) AS (VALUES {vals}),
            xs AS (SELECT DISTINCT xv FROM cells),
            ys AS (SELECT DISTINCT yv FROM cells),
            dense AS (
                SELECT xs.xv, ys.yv, COALESCE(c.cnt, 0) AS nf
                FROM xs CROSS JOIN ys
                LEFT JOIN cells c ON c.xv = xs.xv AND c.yv = ys.yv
            ),
            pref AS (
                SELECT xv, yv, nf,
                       SUM(CAST(nf AS HUGEINT)) OVER (
                           PARTITION BY xv ORDER BY yv
                           ROWS UNBOUNDED PRECEDING) AS rowcum
                FROM dense
            ),
            pref2 AS (
                SELECT xv, yv, nf,
                       SUM(rowcum) OVER (PARTITION BY yv ORDER BY xv
                           ROWS UNBOUNDED PRECEDING) AS fcum
                FROM pref
            ),
            pref3 AS (
                SELECT xv, yv, nf,
                       LAG(fcum, 1, 0) OVER (
                           PARTITION BY yv ORDER BY xv) AS gleft
                FROM pref2
            ),
            pref4 AS (
                SELECT xv, yv, nf, gleft,
                       LAG(gleft, 1, 0) OVER (
                           PARTITION BY xv ORDER BY yv) AS p
                FROM pref3
            ),
            colm AS (SELECT xv, CAST(SUM(nf) AS HUGEINT) AS cx
                     FROM dense GROUP BY xv),
            colc AS (
                SELECT xv,
                       SUM(cx) OVER (ORDER BY xv ROWS UNBOUNDED PRECEDING)
                           - cx AS lx
                FROM colm
            )
            SELECT CAST(SUM(CAST(nf AS HUGEINT) * p) AS BIGINT),
                   CAST(SUM(CAST(nf AS HUGEINT) * (lx - gleft)) AS BIGINT)
            FROM pref4 JOIN colc USING (xv)
        """).fetchone()
        items = list(cells.items())
        c = d = 0
        for i, ((x1, y1), n1) in enumerate(items):
            for (x2, y2), n2 in items[i + 1 :]:
                prod = (x1 - x2) * (y1 - y2)
                if prod > 0:
                    c += n1 * n2
                elif prod < 0:
                    d += n1 * n2
        assert got == (c, d), (case, got, (c, d), cells)


def test_pp21_matches_python_es_sample(spark, duck):
    """Pure-Python Efraimidis-Spirakis with the identical hash/ln
    quantization — the sampled set and keys must match exactly; also
    sanity-check the weighting direction (the sample's mean length
    should exceed the corpus mean, since weight = n_chars)."""
    import hashlib

    rows = REGISTRY["pp21_weighted_sample"].spark(spark, SF_DIR).collect()
    docs = duck.execute(
        "SELECT doc_id, n_chars FROM documents WHERE n_chars > 0"
    ).fetchall()
    m = 1_000_000
    keyed = []
    for doc_id, w in docs:
        u = (
            int(hashlib.md5(f"pp21:{doc_id}".encode()).hexdigest()[:15], 16)
            % (m - 1)
            + 1
        )
        e = 13_815_511 - round(math.log(u) * m)
        keyed.append((e * m // w, doc_id, w))
    keyed.sort()
    want = {(d, k) for k, d, _ in keyed[:25]}
    got = {(r["doc_id"], r["key_nano"]) for r in rows}
    assert got == want
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus_mean = sum(w for _, w in docs) / len(docs)
    assert sample_mean > corpus_mean


def test_a44_matches_python_order_statistics(spark, duck):
    """Pure-Python order-statistic CI with the same rank formula —
    exact equality, plus the bracket-contains-median invariant."""
    got = {
        r["event_type"]: r
        for r in REGISTRY["a44_median_ci"].spark(spark, SF_DIR).collect()
    }
    rows = duck.execute(
        "SELECT event_type, CAST(ROUND(value*100) AS BIGINT) FROM events"
    ).fetchall()
    per_g: dict[str, list[int]] = {}
    for g, v in rows:
        per_g.setdefault(g, []).append(v)
    for g, vs in per_g.items():
        vs.sort()
        n = len(vs)
        l = max(int(math.floor((n - 1.96 * math.sqrt(n)) / 2.0)), 1)
        u = n + 1 - l
        md = (n + 1) // 2
        r = got[g]
        assert r["n_rows"] == n
        assert r["median_cents"] == vs[md - 1]
        assert r["ci_lo_cents"] == vs[l - 1]
        assert r["ci_hi_cents"] == vs[u - 1]
        assert r["ci_lo_cents"] <= r["median_cents"] <= r["ci_hi_cents"]


def test_ann23_matches_numpy_truncation(spark, duck):
    """numpy recomputation of the per-tier exact top-k overlap (same
    tiebreak) — overlap hits must match exactly, and overlap must be
    monotone non-increasing as dimensions shrink on this data."""
    import numpy as np

    rows = {
        r["dim"]: r
        for r in REGISTRY["ann23_matryoshka_truncation"]
        .spark(spark, SF_DIR)
        .collect()
    }
    data = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    emb = np.array([e for _, e in data], dtype=np.float64)

    def topk(d: int) -> dict[int, set]:
        e = emb[:, :d]
        nrm = np.sqrt((e * e).sum(axis=1))
        out = {}
        for qi in range(5):
            cos = (e @ e[qi]) / (nrm * nrm[qi])
            order = sorted(
                (i for i in range(len(e)) if i != qi),
                key=lambda i: (-cos[i], i),
            )
            out[qi] = set(order[:10])
        return out

    full = topk(64)
    for d in (64, 32, 16):
        t = topk(d)
        hits = sum(len(full[qi] & t[qi]) for qi in range(5))
        assert rows[d]["overlap_hits"] == hits, (d, rows[d], hits)
        assert rows[d]["overlap_ppm"] == hits * 1_000_000 // 50
    assert (
        rows[64]["overlap_hits"]
        >= rows[32]["overlap_hits"]
        >= rows[16]["overlap_hits"]
    )
    assert rows[64]["overlap_ppm"] == 1_000_000


def test_f17_sql_udf_inlines_into_codegen(spark):
    """The SQL UDF body must inline into the physical plan — no
    Python-eval or UDF node anywhere, the whole aggregation inside
    WholeStageCodegen (the zero-cost-abstraction claim)."""
    df = REGISTRY["f17_sql_udf"].spark(spark, SF_DIR)
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the UDF body inlines: the plan is a plain scan -> hash aggregate,
    # no UDF/eval node of any kind (AQE's pre-execution formatted plan
    # doesn't print WholeStageCodegen spans, so assert node types)
    assert "HashAggregate" in plan
    assert "udf" not in plan.lower()
    got = {r["band"]: (r["n_items"], r["total_disc_cents"])
           for r in df.collect()}
    assert set(got) == {"low", "mid", "high"}


def test_f18_table_udf_inlines_as_subquery(spark):
    """The SQL table function must inline — no Python UDTF / eval node;
    the generated dimension side is a plain generator in the plan."""
    df = REGISTRY["f18_sql_table_udf"].spark(spark, SF_DIR)
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "udtf" not in plan.lower()
    rows = df.collect()
    assert [r["bin"] for r in rows] == list(range(6))
    assert sum(r["n_events"] for r in rows) > 0


def test_st27_bitwise_equals_batch_a44(spark):
    got = REGISTRY["st27_stream_median_ci"].spark(spark, SF_DIR).collect()
    want = REGISTRY["a44_median_ci"].spark(spark, SF_DIR).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
