"""Round-13 operators: the streaming near-dup gate's incremental
semantics and commit-path evidence, plus the SQL @ref and bench pieces
not covered elsewhere.
"""

from __future__ import annotations

import pytest

from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def test_st28_gate_equals_batch_recompute(spark, duck):
    """The admitted set must equal the declarative batch answer: keep
    doc d (id >= t0) iff NO doc a < d anywhere in the corpus verifies
    as a near-dup at the threshold — recomputed here independently via
    the registered dd15 pair machinery."""
    import pyspark.sql.functions as F

    from apache_iceberg_spark.operators.dedup import (
        DD15_BATCH_DEN,
        DD15_BATCH_NUM,
        JACCARD_THRESHOLD,
    )
    from apache_iceberg_spark.tables import load_table

    got = sorted(
        (r["doc_id"], r["n_chars"])
        for r in REGISTRY["st28_stream_neardup_gate"]
        .spark(spark, SF_DIR)
        .collect()
    )
    d = load_table(spark, SF_DIR, "documents")
    t0 = int(
        d.agg(
            F.expr(f"(MAX(doc_id) * {DD15_BATCH_NUM}) DIV {DD15_BATCH_DEN}")
        ).first()[0]
    )
    # independent batch recompute: full-corpus verified pairs (dd2's
    # registered operator), rejected = any b >= t0 in a pair
    pairs = REGISTRY["dd2_minhash_lsh"].spark(spark, SF_DIR).collect()
    rejected = {
        p["doc_id_b"]
        for p in pairs
        if p["jaccard"] >= JACCARD_THRESHOLD and p["doc_id_b"] >= t0
    }
    want = sorted(
        (r["doc_id"], len(r["text"]))
        for r in d.filter(F.col("doc_id") >= t0).collect()
        if r["doc_id"] not in rejected
    )
    assert got == want


def test_st28_index_grows_through_ref_log(spark):
    """Every micro-batch must land its signatures in the committed index
    THROUGH the ref log: the bands table ends with 1 (initial snapshot)
    + 4 (one keyed append per micro-batch) = 5 versions, each append
    carrying its idempotency key."""
    import os

    from apache_iceberg_spark.catalog.snapshots import _read_log
    from apache_iceberg_spark.streaming.events import _st28_run

    base, df = _st28_run(spark, SF_DIR)
    df.count()
    log = _read_log(os.path.join(base, "bands"))
    versions = [e for e in log if "version" in e]
    assert len(versions) == 5
    keys = [
        e.get("idempotency_key")
        for e in versions
        if e.get("idempotency_key")
    ]
    assert sorted(keys) == [f"st28-bands-{i}" for i in range(4)]


def test_st28_short_docs_always_pass(spark):
    """A doc too short to carry a MinHash signature (< SHINGLE_WORDS
    tokens) cannot near-dup at this granularity and must be admitted —
    dd2's rule carried to the gate."""
    import pyspark.sql.functions as F

    from apache_iceberg_spark.operators.dedup import (
        DD15_BATCH_DEN,
        DD15_BATCH_NUM,
        SHINGLE_WORDS,
    )
    from apache_iceberg_spark.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    t0 = int(
        d.agg(
            F.expr(f"(MAX(doc_id) * {DD15_BATCH_NUM}) DIV {DD15_BATCH_DEN}")
        ).first()[0]
    )
    short = {
        r["doc_id"]
        for r in d.filter(
            (F.col("doc_id") >= t0)
            & (F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
               < SHINGLE_WORDS)
        ).collect()
    }
    if not short:
        return  # fixture has no short arriving docs at this SF
    admitted = {
        r["doc_id"]
        for r in REGISTRY["st28_stream_neardup_gate"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert short <= admitted


def test_merge_into_variants_and_preconditions(spark, tmp_path):
    """All four matched/not-matched routings, the key-uniqueness raise,
    and atomic single-version commits per merge."""
    import pytest
    from pyspark.sql import Row

    from apache_iceberg_spark.catalog.snapshots import (
        commit_snapshot,
        list_snapshots,
        merge_into,
        read_ref,
    )

    table = str(tmp_path / "t")
    commit_snapshot(
        spark.createDataFrame(
            [Row(k=1, v=10), Row(k=2, v=20), Row(k=3, v=30)]
        ),
        table,
    )
    src = spark.createDataFrame([Row(k=2, v=99), Row(k=4, v=40)])

    merge_into(spark, table, src, on=["k"])  # update + insert
    got = {r.k: r.v for r in read_ref(spark, table, "main").collect()}
    assert got == {1: 10, 2: 99, 3: 30, 4: 40}
    assert len(list_snapshots(table)) == 2  # one atomic version per merge

    merge_into(
        spark, table,
        spark.createDataFrame([Row(k=4, v=0), Row(k=9, v=90)]),
        on=["k"], when_matched="delete", when_not_matched="ignore",
    )
    got = {r.k: r.v for r in read_ref(spark, table, "main").collect()}
    assert got == {1: 10, 2: 99, 3: 30}

    merge_into(
        spark, table,
        spark.createDataFrame([Row(k=1, v=11), Row(k=8, v=80)]),
        on=["k"], when_matched="update", when_not_matched="ignore",
    )
    got = {r.k: r.v for r in read_ref(spark, table, "main").collect()}
    assert got == {1: 11, 2: 99, 3: 30}

    with pytest.raises(ValueError, match="not key-unique"):
        merge_into(
            spark, table,
            spark.createDataFrame([Row(k=7, v=1), Row(k=7, v=2)]),
            on=["k"],
        )


def test_a45_matches_textbook_mutual_information(spark, duck):
    """Float-math MI/H over the same contingency must sit within the
    per-term micro-nat rounding envelope of the exact integer result."""
    import math

    row = REGISTRY["a45_mutual_information"].spark(spark, SF_DIR).collect()[0]
    cells = duck.execute(
        "SELECT event_type, EXTRACT(hour FROM ts), COUNT(*) FROM events "
        "GROUP BY 1, 2"
    ).fetchall()
    n = sum(c for _, _, c in cells)
    from collections import defaultdict

    mx, my = defaultdict(int), defaultdict(int)
    for xv, yv, c in cells:
        mx[xv] += c
        my[yv] += c
    mi = sum(
        c / n * math.log(c * n / (mx[x] * my[y])) for x, y, c in cells
    )
    hy = -sum(c / n * math.log(c / n) for c in my.values())
    assert row["n_rows"] == n
    assert row["mi_micro_nats"] / 1e6 == pytest.approx(mi, abs=5e-5)
    assert row["h_y_micro"] / 1e6 == pytest.approx(hy, abs=5e-5)
    if hy > 0:
        assert row["u_ppm"] / 1e6 == pytest.approx(mi / hy, abs=2e-4)


def test_a46_matches_python_kappa(spark, duck):
    from apache_iceberg_spark.operators.analytics import A46_CENTS_THRESHOLD

    row = REGISTRY["a46_cohens_kappa"].spark(spark, SF_DIR).collect()[0]
    rows = duck.execute(
        "SELECT CAST(ROUND(value*100) AS BIGINT), event_type FROM events"
    ).fetchall()
    n = len(rows)
    n11 = sum(
        1 for v, t in rows if v >= A46_CENTS_THRESHOLD and t == "error"
    )
    n00 = sum(
        1 for v, t in rows if v < A46_CENTS_THRESHOLD and t != "error"
    )
    a1 = sum(1 for v, _ in rows if v >= A46_CENTS_THRESHOLD)
    b1 = sum(1 for _, t in rows if t == "error")
    po = (n11 + n00) / n
    pe = (a1 * b1 + (n - a1) * (n - b1)) / (n * n)
    assert (row["n_rows"], row["n11"], row["n00"]) == (n, n11, n00)
    assert row["kappa"] == pytest.approx((po - pe) / (1 - pe), rel=1e-12)


def test_a47_matches_textbook_jsd(spark, duck):
    """Float-math JSD over the same histograms, same tolerance argument
    as a45; also the [0, ln 2] bound and symmetry-of-definition sanity
    (swapping P/Q changes nothing but the row labels)."""
    import math

    row = REGISTRY["a47_js_divergence"].spark(spark, SF_DIR).collect()[0]
    cells = duck.execute(
        "SELECT CAST(ROUND(value*100) AS BIGINT) AS v, "
        "SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END), "
        "SUM(CASE WHEN event_type='error' THEN 0 ELSE 1 END) "
        "FROM events GROUP BY v"
    ).fetchall()
    np_ = sum(p for _, p, _ in cells)
    nq = sum(q for _, _, q in cells)

    def kl_to_mid(cs, na, nb, swap):
        tot = 0.0
        for _, p, q in cs:
            a, b = (q, p) if swap else (p, q)
            if a == 0:
                continue
            pa = a / na
            m = (a / na + b / nb) / 2
            tot += pa * math.log(pa / m)
        return tot

    jsd = 0.5 * kl_to_mid(cells, np_, nq, False) + 0.5 * kl_to_mid(
        cells, nq, np_, True
    )
    assert (row["n_p_rows"], row["n_q_rows"]) == (np_, nq)
    got = row["jsd_micro_nats"] / 1e6
    assert got == pytest.approx(jsd, abs=2e-4)
    assert 0 <= got <= math.log(2) + 1e-9


def test_ts31_matches_python_page_hinkley(spark, duck):
    """Integer-exact Page-Hinkley reimplementation over the zero-filled
    hourly spine — alarms, max excursion, and counts must match
    exactly."""
    from apache_iceberg_spark.operators.timeseries import (
        TS31_DELTA_DEN,
        TS31_LAMBDA_NUM,
        TS31_MICRO,
    )

    row = REGISTRY["ts31_page_hinkley"].spark(spark, SF_DIR).collect()[0]
    hourly = dict(
        duck.execute(
            "WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS h0 FROM events)"
            " SELECT date_diff('hour', b.h0, date_trunc('hour', ts)),"
            " COUNT(*) FROM events CROSS JOIN b GROUP BY 1"
        ).fetchall()
    )
    m = max(hourly) + 1
    xs = [hourly.get(t, 0) for t in range(m)]
    tt = sum(xs)
    mean = tt * TS31_MICRO // m
    delta = mean // TS31_DELTA_DEN
    lam = mean * TS31_LAMBDA_NUM
    u = 0
    minu = 0
    cx = 0
    first = None
    ph_max = 0
    n_alarm = 0
    for t, x in enumerate(xs):
        cx += x
        u += x * TS31_MICRO - cx * TS31_MICRO // (t + 1) - delta
        minu = min(minu, u)
        ph = u - minu
        ph_max = max(ph_max, ph)
        if ph > lam:
            n_alarm += 1
            if first is None:
                first = t
    assert row["n_points"] == m
    assert row["first_alarm_t"] == first
    assert row["ph_max_micro"] == ph_max
    assert row["n_alarm_hours"] == n_alarm


def test_st29_bitwise_equals_batch_ts31(spark):
    got = REGISTRY["st29_stream_page_hinkley"].spark(spark, SF_DIR).collect()
    want = REGISTRY["ts31_page_hinkley"].spark(spark, SF_DIR).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ts32_matches_python_mann_kendall(spark, duck):
    import math

    row = REGISTRY["ts32_mann_kendall"].spark(spark, SF_DIR).collect()[0]
    hourly = dict(
        duck.execute(
            "WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS h0 FROM events)"
            " SELECT date_diff('hour', b.h0, date_trunc('hour', ts)),"
            " COUNT(*) FROM events CROSS JOIN b GROUP BY 1"
        ).fetchall()
    )
    n = max(hourly) + 1
    xs = [hourly.get(t, 0) for t in range(n)]
    s = sum(
        (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(xs)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        tk * (tk - 1) * (2 * tk + 5) for tk in ties.values()
    )
    if s > 0:
        z = (s - 1.0) / math.sqrt(var18 / 18.0)
    elif s < 0:
        z = (s + 1.0) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    assert row["n_points"] == n
    assert row["s_stat"] == s
    assert row["var_x18"] == var18
    assert row["z"] == pytest.approx(z, rel=1e-12)
    assert row["trend_at_95"] == (abs(z) > 1.96)


def test_w18_matches_python_channel(spark, duck):
    rows = {
        r["o_custkey"]: r
        for r in REGISTRY["w18_rolling_extrema_channel"]
        .spark(spark, SF_DIR)
        .collect()
    }
    orders = duck.execute(
        "SELECT o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) "
        "FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(list)
    for k, c in orders:
        per[k].append(c)
    for k, cs in per.items():
        nb = sum(
            1
            for i, c in enumerate(cs)
            if i > 0 and c > max(cs[max(0, i - 5):i])
        )
        widest = max(
            max(cs[max(0, i - 4):i + 1]) - min(cs[max(0, i - 4):i + 1])
            for i in range(len(cs))
        )
        assert rows[k]["n_orders"] == len(cs)
        assert rows[k]["n_breakouts"] == nb
        assert rows[k]["widest_channel_cents"] == widest


def test_g14_matches_python_peeling(spark, duck):
    from apache_iceberg_spark.operators.graph import G14_K, G14_ROUNDS

    got = {
        r["round"]: (r["n_customers"], r["n_suppliers"], r["n_edges"])
        for r in REGISTRY["g14_kcore_peeling"].spark(spark, SF_DIR).collect()
    }
    edges = set(
        duck.execute(
            "SELECT DISTINCT o_custkey, l_suppkey FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey"
        ).fetchall()
    )
    from collections import Counter

    for rnd in range(G14_ROUNDS + 1):
        cs = {c for c, _ in edges}
        ss = {s for _, s in edges}
        assert got[rnd] == (len(cs), len(ss), len(edges))
        dc = Counter(c for c, _ in edges)
        ds = Counter(s for _, s in edges)
        edges = {
            (c, s)
            for c, s in edges
            if dc[c] >= G14_K and ds[s] >= G14_K
        }


def test_tx27_matches_python_heaps(spark, duck):
    import math
    import re as _re

    rows = REGISTRY["tx27_heaps_law_fit"].spark(spark, SF_DIR).collect()
    docs = duck.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    n = len(docs)
    seen: set[str] = set()
    cum_tokens = 0
    marks = {}
    ks = {(n * j + 9) // 10 for j in range(1, 11)}
    for r, (_, text) in enumerate(docs, start=1):
        toks = _re.split(r"\s+", text.strip().lower())
        cum_tokens += len(toks)
        seen.update(toks)
        if r in ks:
            marks[r] = (cum_tokens, len(seen))
    m = 1_000_000
    pts = [
        (round(math.log(t) * m), round(math.log(v) * m))
        for t, v in marks.values()
    ]
    mm = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    beta = (mm * sxy - sx * sy) / (mm * sxx - sx * sx)
    for row in rows:
        t, v = marks[row["n_docs"]]
        assert row["n_tokens"] == t
        assert row["vocab"] == v
        assert row["heaps_beta"] == pytest.approx(beta, rel=1e-12)
    # The sf0.001 synthetic corpus draws from a bounded template
    # vocabulary, so V(N) saturates and beta legitimately hits 0.
    assert 0.0 <= rows[0]["heaps_beta"] < 1.0


def test_st30_folds_to_global_latest_and_commits_per_batch(spark, duck):
    got = sorted(
        (r["user_id"], r["last_cents"])
        for r in REGISTRY["st30_stream_cdc_upsert"].spark(spark, SF_DIR).collect()
    )
    want = sorted(
        duck.execute(
            "SELECT user_id, CAST(ROUND(value*100) AS BIGINT) FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) rn FROM events) WHERE rn = 1"
        ).fetchall()
    )
    assert got == want


def test_pp22_waterfill_invariants(spark, duck):
    """sum(alloc) == budget exactly; capped sources keep everything;
    uncapped grants differ by at most 1 token; a pure-Python greedy
    waterfill agrees."""
    rows = REGISTRY["pp22_budget_waterfill"].spark(spark, SF_DIR).collect()
    per = dict(
        duck.execute(
            "SELECT source, SUM(len(string_split_regex("
            "lower(trim(text)), '\\s+'))) FROM documents GROUP BY source"
        ).fetchall()
    )
    total = sum(per.values())
    budget = total // 2
    assert sum(r["alloc_tokens"] for r in rows) == budget
    uncapped = []
    for r in rows:
        assert r["tokens_available"] == per[r["source"]]
        assert r["alloc_tokens"] <= r["tokens_available"]
        if r["at_cap"]:
            assert r["alloc_tokens"] == r["tokens_available"]
        else:
            uncapped.append(r["alloc_tokens"])
    if uncapped:
        assert max(uncapped) - min(uncapped) <= 1
        # max-min fairness: every capped source is smaller than any
        # uncapped grant
        cap_max = max(
            (r["alloc_tokens"] for r in rows if r["at_cap"]), default=0
        )
        assert cap_max <= min(uncapped)


def test_st31_st32_bitwise_equal_batch_twins(spark):
    for st, batch in (
        ("st31_stream_mutual_information", "a45_mutual_information"),
        ("st32_stream_jsd_drift", "a47_js_divergence"),
    ):
        got = REGISTRY[st].spark(spark, SF_DIR).collect()
        want = REGISTRY[batch].spark(spark, SF_DIR).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], st


def test_read_pruned_conservative_and_exact(spark, tmp_path):
    """Pruning must never lose rows: stat-less dirs always scan, edge
    ranges touch-inclusive, and the row-level predicate re-applies."""
    import pyspark.sql.functions as F

    from apache_iceberg_spark.catalog.snapshots import (
        commit_append,
        commit_snapshot,
        read_pruned,
    )

    table = str(tmp_path / "t")
    mk = lambda a, b: spark.range(a, b).select(F.col("id").alias("k"))  # noqa: E731
    commit_snapshot(mk(0, 10), table, stats_cols=["k"])
    commit_append(mk(10, 20), table, stats_cols=["k"])
    commit_append(mk(20, 30), table)  # NO stats: must always scan
    commit_append(mk(30, 40), table, stats_cols=["k"])

    df, scanned, pruned = read_pruned(spark, table, "k", 12, 18)
    assert sorted(r.k for r in df.collect()) == list(range(12, 19))
    # dirs: [0,10) pruned, [10,20) kept, stat-less kept, [30,40) pruned
    assert (scanned, pruned) == (2, 2)

    # boundary touch: hi == dir min must keep the dir
    df2, scanned2, _ = read_pruned(spark, table, "k", 9, 10)
    assert sorted(r.k for r in df2.collect()) == [9, 10]
    assert scanned2 == 3  # [0,10), [10,20), stat-less


def test_a49_paired_bootstrap_sanity(spark, duck):
    """The paired-bootstrap CI must bracket the point difference, and a
    pure-Python recompute with the shared lane-mix machinery must agree
    exactly on the point estimate and the replica extremes' ordering."""
    row = REGISTRY["a49_bootstrap_diff_ci"].spark(spark, SF_DIR).collect()[0]
    np_, nq, sp_, sq = duck.execute(
        "SELECT SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END),"
        " SUM(CASE WHEN event_type='error' THEN 0 ELSE 1 END),"
        " SUM(CASE WHEN event_type='error' THEN"
        "   CAST(ROUND(value*100) AS BIGINT) ELSE 0 END),"
        " SUM(CASE WHEN event_type='error' THEN 0 ELSE"
        "   CAST(ROUND(value*100) AS BIGINT) END) FROM events"
    ).fetchall()[0]
    m = 1_000_000
    assert (row["n_p"], row["n_q"]) == (np_, nq)
    assert row["diff_micro"] == sp_ * m // np_ - sq * m // nq
    assert row["ci_lo_micro"] <= row["ci_hi_micro"]
    assert row["significant_at_95"] == (
        row["ci_lo_micro"] > 0 or row["ci_hi_micro"] < 0
    )


def test_dd24_inflation_matches_python(spark, duck):
    import re as _re

    rows = {
        r["source"]: r
        for r in REGISTRY["dd24_dup_inflation_factor"]
        .spark(spark, SF_DIR)
        .collect()
    }
    docs = duck.execute("SELECT source, text FROM documents").fetchall()
    from collections import defaultdict

    tot = defaultdict(int)
    uniq = defaultdict(dict)
    cnt = defaultdict(int)
    for src, text in docs:
        n = len(_re.split(r"\s+", text.strip().lower()))
        tot[src] += n
        cnt[src] += 1
        uniq[src][text] = n
    for src, r in rows.items():
        ut = sum(uniq[src].values())
        assert r["n_docs"] == cnt[src]
        assert r["n_unique_docs"] == len(uniq[src])
        assert r["total_tokens"] == tot[src]
        assert r["unique_tokens"] == ut
        assert r["inflation_ppm"] == tot[src] * 1_000_000 // ut
        assert r["inflation_ppm"] >= 1_000_000
