"""Round-8 tests: byte-level production BPE (VERDICT r7 ask #1), the
release_plan_caches serving-loop lifecycle (ask #5), and the other
round-8 operators/refinements."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


# ---------------------------------------------------------------------------
# Byte-level BPE (tx15/tx17)
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, docs: list[str]) -> str:
    import pandas as pd

    pdf = pd.DataFrame(
        [(i, t) for i, t in enumerate(docs)], columns=["doc_id", "text"]
    )
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_tx15_spark_byte_level_non_ascii(spark, tmp_path):
    """The Spark trainer on a NON-ASCII corpus must equal the pure
    byte-level reference: multi-byte UTF-8 words (é=2 bytes, €=3,
    Greek=2/char) split into per-byte symbols and re-join via merges."""
    from tests.test_round6_ops import _hex_syms, _ref_bpe

    docs = [
        "café café crème",
        "€uro €uro zone",
        "σπάρκ engine σπάρκ",
        "café zone",
    ]
    sf = _write_docs(spark, tmp_path, docs)
    words: dict = {}
    for d in docs:
        for w in d.lower().split():
            words[w] = words.get(w, 0) + 1
    from apache_iceberg_spark.operators.text import TX15_MERGES

    want = sorted(_ref_bpe(words, TX15_MERGES))
    got = sorted(
        tuple(r)
        for r in REGISTRY["tx15_bpe_merges"].spark(spark, sf).collect()
    )
    assert got == want
    # byte-level sanity: the 2-hex symbols cover the multi-byte chars
    first_syms = {r[1] for r in got} | {r[2] for r in got}
    assert any(len(s) >= 2 and s >= "80" for s in first_syms if len(s) == 2), (
        "expected non-ASCII (>=0x80) byte symbols in the merge table"
    )


def test_tx15_distributed_branch_matches_driver_branch(spark, tmp_path):
    """Forcing the distributed per-round loop (gate=0) must produce the
    identical merge table as the driver incremental loop — the two
    branches of the TX15_DRIVER_VOCAB gate are interchangeable."""
    import apache_iceberg_spark.operators.text as tx

    docs = ["ab ab abc cafe café", "b c ab aaaa", "x aaaa café"]
    sf = _write_docs(spark, tmp_path, docs)
    driver, n_vocab = tx._tx15_train(spark, sf, n_merges=8)
    saved = tx.TX15_DRIVER_VOCAB
    tx.TX15_DRIVER_VOCAB = 0
    try:
        dist, n2 = tx._tx15_train(spark, sf, n_merges=8)
    finally:
        tx.TX15_DRIVER_VOCAB = saved
    assert n_vocab == n2 and n_vocab > 0
    assert driver == dist


def test_tx17_raises_on_degenerate_corpus(spark, tmp_path):
    """ADVICE r7: a corpus yielding fewer than TX15_MERGES merges must
    fail LOUDLY (the oracle's CROSS JOIN over an empty merge round would
    silently empty the result)."""
    sf = _write_docs(spark, tmp_path, ["x y", "x"])
    with pytest.raises(RuntimeError, match="merges"):
        REGISTRY["tx17_bpe_encode"].spark(spark, sf).collect()


def test_tx17_encode_accounting_non_ascii(spark, tmp_path):
    """tx17's per-doc accounting on a multi-byte corpus: n_sym_before is
    the UTF-8 BYTE count (not char count), and applying the learned
    merges by hand to each word reproduces n_sym_after."""
    import apache_iceberg_spark.operators.text as tx
    from tests.test_round6_ops import _hex_syms

    docs = ["café café crème zone", "€uro zone café", "σπάρκ σπάρκ"]
    sf = _write_docs(spark, tmp_path, docs)
    saved = tx.TX15_MERGES
    tx.TX15_MERGES = 6  # the tiny corpus supports only a few merges
    try:
        merges, _ = tx._tx15_train(spark, sf)

        def encode(word):
            syms = _hex_syms(word)
            for _r, a, b, _m, _c in merges:
                ns = []
                for t in syms:
                    if ns and ns[-1] == a and t == b:
                        ns[-1] = a + b
                    else:
                        ns.append(t)
                syms = ns
            return syms

        want = {}
        for i, d in enumerate(docs):
            ws = d.lower().split()
            before = sum(len(w.encode("utf-8")) for w in ws)
            after = sum(len(encode(w)) for w in ws)
            want[i] = (len(ws), before, after, before - after)
        got = {
            r["doc_id"]: (
                r["n_words"],
                r["n_sym_before"],
                r["n_sym_after"],
                r["n_merged"],
            )
            for r in REGISTRY["tx17_bpe_encode"].spark(spark, sf).collect()
        }
        assert got == want
    finally:
        tx.TX15_MERGES = saved


# ---------------------------------------------------------------------------
# release_plan_caches serving-loop lifecycle (VERDICT r7 ask #5)
# ---------------------------------------------------------------------------


def test_release_plan_caches_serving_loop(spark):
    """A long-running serving loop interleaving plan-cache operators with
    release_plan_caches must leave NO frame the loop created behind after
    EVERY release — the documented escape hatch of the persist-lifecycle
    convention, proven end-to-end rather than relied on (VERDICT r7 ask
    #5).

    Order-robustness (r9 verdict ask #4, hardened again in r10): the
    assert tracks the SET of persistent RDD ids, not a global count —
    earlier suite tests leave localCheckpoint RDDs that
    spark.catalog.clearCache() does not own and that the ContextCleaner
    GCs asynchronously MID-LOOP, so any count-equality baseline is
    inherently racy in full runs (it failed twice on negative deltas).
    'No id that appeared during this loop survives its release' is the
    actual invariant, and it is immune to background shrinkage."""
    from tests.conftest import SF_DIR

    from apache_iceberg_spark.session import release_plan_caches

    jsc = spark.sparkContext._jsc

    def rdd_ids() -> set[int]:
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    spark.catalog.clearCache()
    release_plan_caches(spark)
    seen = rdd_ids()
    # Three plan-cache operators (similarity carries # plan-cache persist
    # sites) plus one plain query, back to back, as a serving loop would.
    for name in (
        "ann6_pq_adc",
        "ann9_ivf_pq",
        "dd15_incremental_dedup",
        "a2_groupby_count",
    ):
        REGISTRY[name].spark(spark, SF_DIR).count()
        release_plan_caches(spark)
        after = rdd_ids()
        survivors = after - seen
        assert not survivors, (
            f"{name}: {len(survivors)} cached frames created by the loop "
            f"survived release_plan_caches (rdd ids {sorted(survivors)})"
        )
        seen = after  # tolerate background GC shrinking the stale set


# ---------------------------------------------------------------------------
# Delta-frontier g5 (VERDICT r7 ask #2)
# ---------------------------------------------------------------------------


def _path_adj(spark, n: int):
    """Undirected path graph 0-1-...-n as a (src, dst) adjacency frame."""
    e = spark.range(n).selectExpr("id AS u", "id + 1 AS v")
    return e.selectExpr("u AS src", "v AS dst").unionAll(
        e.selectExpr("v AS src", "u AS dst")
    )


def test_g5_expands_frontier_not_settled(spark):
    """On a path graph seeded at one end, every BFS layer holds exactly
    ONE node while the settled set grows — so asserting layer sizes
    == 1 proves the per-hop expansion input is the delta frontier, not
    the settled union (whose re-aggregated frame had sizes 1,2,3,...
    in the r7 form)."""
    from apache_iceberg_spark.operators.graph import _g5_layers

    adj = _path_adj(spark, 6)
    seeds = spark.createDataFrame([(0, 0)], "node long, dist long")
    layers = list(_g5_layers(adj, seeds, 4))
    assert len(layers) == 5  # hops 0..4
    for h, lay in enumerate(layers):
        rows = lay.collect()
        assert len(rows) == 1, f"hop {h}: frontier is not a delta"
        assert (rows[0].node, rows[0].dist) == (h, h)


def test_g5_early_exits_on_empty_frontier(spark):
    """A 2-node graph exhausts at hop 1; the driver loop must stop
    yielding instead of running empty rounds to the hop cap."""
    from apache_iceberg_spark.operators.graph import _g5_layers

    adj = _path_adj(spark, 1)
    seeds = spark.createDataFrame([(0, 0)], "node long, dist long")
    layers = list(_g5_layers(adj, seeds, 4))
    assert [lay.count() for lay in layers] == [1, 1]  # hops 0 and 1 only


def test_g5_distances_correct_on_branching_graph(spark):
    """Delta-frontier BFS equals per-node shortest distance on a graph
    with multiple routes: a 4-cycle with a tail, where node 2 is
    reachable two ways (both length 2) and must appear once."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4)]
    adj = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src long, dst long"
    )
    from apache_iceberg_spark.operators.graph import _g5_layers

    seeds = spark.createDataFrame([(0, 0)], "node long, dist long")
    got = {
        r.node: r.dist
        for lay in _g5_layers(adj, seeds, 4)
        for r in lay.collect()
    }
    assert got == {0: 0, 1: 1, 3: 1, 2: 2, 4: 3}


# ---------------------------------------------------------------------------
# ts11 auto-sized bucket width (VERDICT r7 ask #3)
# ---------------------------------------------------------------------------


def _tus_frame(spark, specs):
    """Synthetic (user_id, tus) frame: specs = [(user_id, n_events,
    span_us)] with each user's events spread uniformly over its span
    starting at the 2024 epoch."""
    base = 1_704_067_200_000_000  # 2024-01-01 in µs
    frames = []
    for uid, n, span in specs:
        step = max(span // n, 1)  # pre-divide: id * span overflows BIGINT
        frames.append(
            spark.range(n).selectExpr(
                f"CAST({uid} AS INT) AS user_id",
                f"CAST({base} + id * {step} AS BIGINT) AS tus",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


def test_ts11_autosizer_uniform_keeps_day_buckets(spark):
    """100 cold users x 1,000 events over 30 days: every (user, day)
    count is tiny, so the auto-sizer must keep the widest (day) bucket
    — minimizing level-2 rows is the whole point of segmenting."""
    from apache_iceberg_spark.operators import timeseries as tsm

    e = _tus_frame(spark, [(u, 1_000, 30 * 86_400_000_000) for u in range(100)])
    assert tsm._ts11_pick_bucket_us(e) == tsm.TS11_LADDER_US[0]


def test_ts11_autosizer_hot_key_picks_hour_or_finer(spark):
    """The SCALE_NOTES §EWMA failure fixture — one 64M-event hot key over
    30 days — must select hour-or-finer buckets (measured per-day max
    ≈ 2.13M > the 1M target; per-hour ≈ 89k fits), i.e. exactly the
    width the manual probe showed completes where day buckets OOM."""
    from apache_iceberg_spark.operators import timeseries as tsm

    e = _tus_frame(spark, [(1, 64_000_000, 30 * 86_400_000_000)])
    assert tsm._ts11_pick_bucket_us(e) == tsm.TS11_LADDER_US[1]


def test_ts11_autosizer_burst_inside_one_hour_picks_minute(spark):
    """A key whose daily AVERAGE looks safe but whose history is crammed
    into single hours must still be caught: the sizer uses measured
    per-granularity maxima, not uniformity assumptions. 2M events
    inside one hour -> per-day max 2M > target, per-hour max 2M >
    target, per-minute max ≈ 33k fits -> minute."""
    from apache_iceberg_spark.operators import timeseries as tsm

    e = _tus_frame(spark, [(1, 2_000_000, 3_600_000_000)])
    assert tsm._ts11_pick_bucket_us(e) == tsm.TS11_LADDER_US[2]


def test_ts11_floor_bucketing_pre_epoch(spark):
    """Pre-epoch timestamps (negative µs) must bucket by FLOOR division
    on both engines (ADVICE r7): -1 µs belongs to the day before the
    epoch, not to bucket 0. Checked against DuckDB running the oracle's
    spelled-out pmod form on the same values."""
    import duckdb

    from apache_iceberg_spark.operators.timeseries import (
        TS11_LADDER_US,
        _duck_floor_div,
        _floor_div,
    )

    day = TS11_LADDER_US[0]
    vals = [-1, -day, -day - 1, 0, 1, day, 2 * day + 5]
    got = {
        r.tus: r.b
        for r in spark.createDataFrame([(v,) for v in vals], "tus long")
        .selectExpr("tus", f"{_floor_div('tus', day)} AS b")
        .collect()
    }
    want = {
        v: duckdb.sql(f"SELECT {_duck_floor_div(str(v), day)}").fetchone()[0]
        for v in vals
    }
    assert got == want
    assert got[-1] == -1 and got[0] == 0 and got[-day] == -1


# ---------------------------------------------------------------------------
# tx19 model-based quality filter (VERDICT r7 ask #4)
# ---------------------------------------------------------------------------


def test_tx19_training_reproduces_pinned_coefficients(spark):
    """Refitting the Spark ML LR on the training SF must land on the
    pinned TX19_COEF (LBFGS is deterministic up to float aggregation
    order → rtol 5e-2), proving the literals are the model, not magic."""
    from apache_iceberg_spark.operators.text import (
        TX19_COEF,
        tx19_train_coefficients,
    )

    refit = tx19_train_coefficients(spark, "/root/testdata/sf0.01")
    assert set(refit) == set(TX19_COEF)
    for k, pinned in TX19_COEF.items():
        assert refit[k] == pytest.approx(pinned, rel=5e-2), (
            k,
            refit[k],
            pinned,
        )


def test_tx19_margin_agrees_with_pseudo_label(spark):
    """The classifier must reproduce its tx12 pseudo-label on ≥98% of
    sf0.001 documents (train accuracy at sf0.01 was 99.4%; the two SFs
    draw from the same generator)."""
    from tests.conftest import SF_DIR

    pred = REGISTRY["tx19_quality_classifier"].spark(spark, SF_DIR)
    label = REGISTRY["tx12_gopher_rules"].spark(spark, SF_DIR).select(
        "doc_id", F.col("keep").alias("label")
    )
    j = pred.join(label, "doc_id")
    n = j.count()
    agree = j.filter(F.col("pred_keep") == F.col("label")).count()
    assert n == 500
    assert agree / n >= 0.98, f"{agree}/{n}"


def test_tx19_refit_decisions_match_pinned(spark):
    """Even where refit coefficients differ in low digits, the DECISIONS
    of the refit model and the pinned fold must agree on ≥99% of docs —
    the stability property that justifies pinning."""
    from tests.conftest import SF_DIR

    from apache_iceberg_spark.operators.text import (
        _tx19_features,
        tx19_train_coefficients,
    )
    from apache_iceberg_spark.tables import load_table

    c = tx19_train_coefficients(spark, "/root/testdata/sf0.01")
    feats = _tx19_features(load_table(spark, SF_DIR, "documents"))
    refit_margin = (
        F.lit(c["intercept"])
        + F.lit(c["f_words"]) * F.col("f_words")
        + F.lit(c["mean_word_len"]) * F.col("mean_word_len")
        + F.lit(c["stop_ratio"]) * F.col("stop_ratio")
        + F.lit(c["stop_hits"]) * F.col("stop_hits")
    )
    refit_pred = feats.select("doc_id", (refit_margin > 0).alias("refit_keep"))
    pinned = REGISTRY["tx19_quality_classifier"].spark(spark, SF_DIR).select(
        "doc_id", "pred_keep"
    )
    j = pinned.join(refit_pred, "doc_id")
    n = j.count()
    agree = j.filter(F.col("pred_keep") == F.col("refit_keep")).count()
    assert agree / n >= 0.99, f"{agree}/{n}"


def test_st16_stream_equals_batch_gate(spark):
    """The streaming quality gate must emit EXACTLY the batch tx19 keep
    set with identical margins — the stateless map-only parity claim."""
    from tests.conftest import SF_DIR

    batch = (
        REGISTRY["tx19_quality_classifier"]
        .spark(spark, SF_DIR)
        .filter("pred_keep")
        .select("doc_id", "margin")
    )
    stream = REGISTRY["st16_stream_quality_gate"].spark(spark, SF_DIR)
    assert stream.count() == batch.count()
    assert (
        stream.exceptAll(batch).count() == 0
        and batch.exceptAll(stream).count() == 0
    )


# ---------------------------------------------------------------------------
# dd19 duplicate-span fraction
# ---------------------------------------------------------------------------


def test_dd19_constructed_corpus(spark, tmp_path):
    """A doc whose text is wholly contained in another must score
    dup_frac 1.0 (every span duplicated) and be dropped; a short doc
    (< span width) must get n_spans=0 and keep=True; a unique long doc
    keeps with dup_frac 0."""
    from apache_iceberg_spark.operators.dedup import DD19_SPAN_WORDS

    words = [f"w{i}" for i in range(DD19_SPAN_WORDS + 4)]
    shared = " ".join(words)
    docs = [
        shared,                                  # 0: fully inside doc 1
        shared + " tail extra unique tokens",    # 1: prefix duplicated
        "tiny doc",                              # 2: no spans
        " ".join(f"u{i}" for i in range(20)),    # 3: unique
    ]
    sf = _write_docs(spark, tmp_path, docs)
    rows = {
        r.doc_id: r
        for r in REGISTRY["dd19_dup_span_fraction"].spark(spark, sf).collect()
    }
    assert rows[0].dup_frac == 1.0 and not rows[0].keep
    assert rows[1].n_dup_spans == rows[0].n_spans  # the shared prefix
    assert rows[2].n_spans == 0 and rows[2].keep
    assert rows[3].dup_frac == 0.0 and rows[3].keep


# ---------------------------------------------------------------------------
# ann18 MMR diversified top-k
# ---------------------------------------------------------------------------


def test_ann18_diversifies_vs_plain_topk(spark):
    """Per query: rank-1 must equal ann1's top-1 (first greedy pick is
    pure relevance), the 3 picks are distinct, and the average pairwise
    cosine WITHIN the MMR set is ≤ that of ann1's plain top-3 — the
    redundancy-reduction property MMR exists for (measured: strictly
    lower on 4 of 5 fixture queries, equal on the 5th)."""
    import itertools

    import numpy as np

    from tests.conftest import SF_DIR

    mmr = REGISTRY["ann18_mmr_diverse_topk"].spark(spark, SF_DIR).collect()
    ann1 = REGISTRY["ann1_cosine_topk"].spark(spark, SF_DIR).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=float)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }

    def cos(a, b):
        return float(
            emb[a] @ emb[b] / (np.linalg.norm(emb[a]) * np.linalg.norm(emb[b]))
        )

    def avg_pair(ids):
        ps = list(itertools.combinations(ids, 2))
        return sum(cos(a, b) for a, b in ps) / len(ps)

    for qid in range(5):
        picks = [
            r.neighbor_id
            for r in sorted(
                (x for x in mmr if x.query_id == qid),
                key=lambda r: r.mmr_rank,
            )
        ]
        top3 = [r.neighbor_id for r in ann1 if r.query_id == qid][:3]
        assert len(set(picks)) == 3
        assert picks[0] == top3[0]
        assert avg_pair(picks) <= avg_pair(top3) + 1e-12, (qid, picks, top3)


# ---------------------------------------------------------------------------
# g6 Katz centrality
# ---------------------------------------------------------------------------


def test_g6_walk_recurrence_self_consistent(spark):
    """walks_{l+1}(v) must equal Σ_{u∈N(v)} walks_l(u) over the actual
    kNN edge list, and katz_scaled must be the exact 64/8/1 fold —
    the Katz recurrence re-derived independently in driver python."""
    from collections import defaultdict

    from tests.conftest import SF_DIR

    from apache_iceberg_spark.operators.graph import _knn_edges

    rows = {
        r.suppkey: r
        for r in REGISTRY["g6_katz_centrality"].spark(spark, SF_DIR).collect()
    }
    nbrs = defaultdict(set)
    for e in _knn_edges(spark, SF_DIR).collect():
        nbrs[e.u].add(e.v)
        nbrs[e.v].add(e.u)
    assert set(rows) == set(nbrs)
    for v, r in rows.items():
        assert r.walks1 == len(nbrs[v])
        assert r.walks2 == sum(rows[u].walks1 for u in nbrs[v])
        assert r.walks3 == sum(rows[u].walks2 for u in nbrs[v])
        assert r.katz_scaled == 64 * r.walks1 + 8 * r.walks2 + r.walks3


# ---------------------------------------------------------------------------
# ts14 seasonal anomalies
# ---------------------------------------------------------------------------


def test_ts14_planted_anomaly(spark, tmp_path):
    """On a flat hourly-seasonal series with ONE planted spike, ts14 must
    flag exactly the spike: the seasonal component absorbs the hourly
    level, so only the spike's residual survives the 3σ gate."""
    import datetime

    rows = []
    eid = 0
    for day in range(5):
        for hr in range(24):
            ts = datetime.datetime(2024, 1, 1 + day, hr, 0, 0)
            # hourly seasonal level 10+hr, tiny deterministic jitter
            val = 10.0 + hr + (0.01 * ((eid * 7) % 5))
            rows.append((eid, ts, 1, "click", val, "{}"))
            eid += 1
    spike_id = 57
    rows[spike_id] = (spike_id, rows[spike_id][1], 1, "click", 500.0, "{}")
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_id: r
        for r in REGISTRY["ts14_seasonal_anomalies"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out[spike_id].is_anomaly
    flagged = [i for i, r in out.items() if r.is_anomaly]
    assert flagged == [spike_id], flagged


# ---------------------------------------------------------------------------
# w11 rolling median
# ---------------------------------------------------------------------------


def test_w11_median_is_robust_to_spike(spark, tmp_path):
    """Hand-computed frame medians on a tiny series: a single spike must
    not move the rolling median (the robustness property w5's mean
    lacks), and short prefixes use the lower-middle of the available
    frame."""
    import datetime

    vals = [10.0, 10.0, 10.0, 500.0, 10.0, 10.0, 10.0, 10.0]
    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_id: r
        for r in REGISTRY["w11_rolling_median"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert all(out[i].med_centi == 1000 for i in range(len(vals))), out
    assert out[3].n_win == 4 and out[7].n_win == 7


# ---------------------------------------------------------------------------
# m26 clustering-depth report
# ---------------------------------------------------------------------------


def _overlap_depth(intervals):
    """Max overlap depth of inclusive integer intervals via the +1/−1
    boundary sweep (independent re-derivation of m26's window walk)."""
    from collections import Counter

    ev = Counter()
    for lo, hi in intervals:
        ev[lo] += 1
        ev[hi + 1] -= 1
    depth = best = 0
    for pt in sorted(ev):  # same-point deltas collapse (ts7/m26 r8 fix)
        depth += ev[pt]
        best = max(best, depth)
    return best


def test_m26_contrast_and_real_footer_binding(spark, tmp_path):
    """(a) The modeled report must show the clustering contrast: range
    layout ⇒ depth ≤ 2 (only date-split boundaries overlap), hash
    layout ⇒ depth = n_files (every file spans the whole key range).
    (b) Bounds from REAL parquet footers of a write_with_manifest
    range-clustered write must yield the same ≤2 depth via the same
    sweep — binding the modeled metric to physical file metadata."""
    import os

    import pyarrow.parquet as pq

    from tests.conftest import SF_DIR

    from apache_iceberg_spark.catalog.manifests import (
        _local_path,
        write_with_manifest,
    )
    from apache_iceberg_spark.operators.scale import M26_FILES
    from apache_iceberg_spark.tables import load_table

    rep = {
        r.layout: r
        for r in REGISTRY["m26_clustering_depth_report"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert rep["hashed"].max_depth == M26_FILES
    assert rep["clustered"].max_depth <= 2
    assert rep["clustered"].max_width < rep["hashed"].max_width

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("key"),
    )
    path = str(tmp_path / "orders_clustered")
    write_with_manifest(o, path, cluster_by="key", track_cols=["key"],
                        n_files=M26_FILES)
    intervals = []
    for f in spark.read.parquet(os.path.join(path, "data")).inputFiles():
        md = pq.ParquetFile(_local_path(f)).metadata
        idx = [
            md.schema.column(i).name for i in range(md.num_columns)
        ].index("key")
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        intervals.append((min(los), max(his)))
    assert len(intervals) == M26_FILES
    assert _overlap_depth(intervals) <= 2


# ---------------------------------------------------------------------------
# pp15 curation ablation grid
# ---------------------------------------------------------------------------


def test_pp15_marginals_are_consistent(spark):
    """The CUBE must be internally consistent: the grand-total row holds
    100% of tokens (1e6 micro), every marginal equals the sum of its
    fine cells, and doc counts add to the corpus size."""
    from tests.conftest import SF_DIR

    rows = (
        REGISTRY["pp15_curation_ablation_grid"].spark(spark, SF_DIR).collect()
    )
    cells = {(r.lang, r.keep_quality, r.is_dup): r for r in rows}
    grand = cells[("ALL", "ALL", "ALL")]
    assert grand.pct_tokens_micro == 1_000_000
    assert grand.n_docs == 500
    fine = [
        r
        for r in rows
        if "ALL" not in (r.lang, r.keep_quality, r.is_dup)
    ]
    assert sum(r.n_docs for r in fine) == grand.n_docs
    assert sum(r.n_tokens for r in fine) == grand.n_tokens
    for lang in {r.lang for r in fine}:
        marg = cells[(lang, "ALL", "ALL")]
        assert marg.n_tokens == sum(
            r.n_tokens for r in fine if r.lang == lang
        )


# ---------------------------------------------------------------------------
# tx20 bigram surprisal
# ---------------------------------------------------------------------------


def test_tx20_backoff_and_rarity_hand_checked(spark, tmp_path):
    """Hand-computable corpus: a repeated bigram scores its conditional
    inverse frequency from the pruned table; a singleton bigram falls
    back to 5/2 x inverse unigram frequency; a repetitive doc lands in
    a lower band than a one-off-heavy doc."""
    docs = [
        "a b a b a b",   # doc 0: 5 bigrams, all repeats of 'a b'/'b a'
        "a b c d",       # doc 1: 'a b' common; 'b c','c d' singletons
        "a b a b",       # doc 2: more 'a b' mass
    ]
    sf = _write_docs(spark, tmp_path, docs)
    out = {
        r.doc_id: r
        for r in REGISTRY["tx20_bigram_surprisal"].spark(spark, sf).collect()
    }
    # corpus bigrams: 'a b' x5 (docs 0:3,1:1,2:2 -> c=6? doc0 has a,b,a,b,a,b ->
    # bigrams ab,ba,ab,ba,ab = 3x'a b', 2x'b a'; doc1: ab,bc,cd; doc2: ab,ba,ab
    # c('a b')=3+1+2=6, c('b a')=2+0+1=3, c('b c')=1, c('c d')=1 (pruned)
    # ctx c('a .')=6, c('b .')=3+1=4, c('c .')=1
    MICRO = 1_000_000
    rar_ab = 6 * MICRO // 6        # 1.0 in micro
    rar_ba = 4 * MICRO // 3
    # unigrams: a=6 (3+1+2), b=6 (3+1+2), c=1, d=1, total=14
    rar_bo_c = ((14 * MICRO // 1) * 5) // 2
    rar_bo_d = rar_bo_c
    assert out[1].n_backoff == 2
    assert out[0].n_backoff == 0
    exp1 = (rar_ab + rar_bo_c + rar_bo_d) // 3
    assert out[1].mean_bigram_rarity_micro == exp1
    exp0 = (3 * rar_ab + 2 * rar_ba) // 5
    assert out[0].mean_bigram_rarity_micro == exp0
    assert out[1].band == "rare" and out[0].band == "common"


# ---------------------------------------------------------------------------
# a24 Gini diversity
# ---------------------------------------------------------------------------


def test_a24_gini_hand_checked(spark, tmp_path):
    """Pure source → gini 0 / hhi 1e6; a 50/50 source → gini 0.5 / hhi
    0.5; the two measures are exact complements up to floor rounding."""
    import pandas as pd

    rows = (
        [(i, "x", "en", "pure", 1) for i in range(4)]
        + [(10 + i, "x", "en", "even", 1) for i in range(2)]
        + [(20 + i, "x", "de", "even", 1) for i in range(2)]
    )
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.source: r
        for r in REGISTRY["a24_gini_diversity"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out["pure"].gini_micro == 0 and out["pure"].hhi_micro == 1_000_000
    assert out["even"].gini_micro == 500_000
    assert out["even"].hhi_micro == 500_000
    for r in out.values():
        assert 0 <= 1_000_000 - (r.gini_micro + r.hhi_micro) <= 2


def test_st17_stream_equals_batch_ts14(spark):
    """Frame equality with batch ts14 — the frozen-state serving-parity
    contract (training on the static side, scoring on the stream)."""
    from tests.conftest import SF_DIR

    batch = REGISTRY["ts14_seasonal_anomalies"].spark(spark, SF_DIR)
    stream = REGISTRY["st17_stream_seasonal_scoring"].spark(spark, SF_DIR)
    assert stream.count() == batch.count()
    assert (
        stream.exceptAll(batch).count() == 0
        and batch.exceptAll(stream).count() == 0
    )


# ---------------------------------------------------------------------------
# f14 bitmask rollup / a25 KS drift
# ---------------------------------------------------------------------------


def test_f14_mask_semantics(spark):
    """type_mask must be the exact OR of per-type bits, n_types the
    popcount, and did_purchase must agree with a semi-join re-check."""
    from tests.conftest import SF_DIR

    from apache_iceberg_spark.operators.functions_ext import F14_TYPES
    from apache_iceberg_spark.tables import load_table

    out = {
        r.user_id: r
        for r in REGISTRY["f14_bitmask_rollup"].spark(spark, SF_DIR).collect()
    }
    truth = {}
    for row in (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type")
        .collect()
    ):
        truth.setdefault(row.user_id, set()).add(row.event_type)
    for uid, types in truth.items():
        mask = sum(1 << F14_TYPES.index(t) for t in types)
        assert out[uid].type_mask == mask
        assert out[uid].n_types == len(types)
        assert out[uid].did_purchase == ("purchase" in types)


def test_a25_planted_drift_and_null_case(spark, tmp_path):
    """A refresh slice drawn from a shifted distribution must alarm;
    an identically-distributed refresh must not (KS exact-zero when the
    two empirical CDFs coincide)."""
    import datetime

    def write(dirname, new_vals):
        rows = []
        for i in range(80):  # reference: ids 0..79, values cycle 1..8
            rows.append(
                (i, datetime.datetime(2024, 1, 1), 1, "click",
                 float(1 + i % 8), "{}")
            )
        for j, v in enumerate(new_vals):  # refresh: ids 80..99
            rows.append(
                (80 + j, datetime.datetime(2024, 1, 2), 1, "click",
                 float(v), "{}")
            )
        p = tmp_path / dirname
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(str(p / "events.parquet"))
        return str(p)

    drifted = write("drift", [100 + k for k in range(20)])
    same = write("same", [1 + (79 + k) % 8 for k in range(20)])
    r1 = REGISTRY["a25_ks_drift"].spark(spark, drifted).collect()[0]
    r2 = REGISTRY["a25_ks_drift"].spark(spark, same).collect()[0]
    # split point t0 = (99*4)//5 = 79: reference ids 0..78, refresh 79..99
    assert r1.n_ref == 79 and r1.n_new == 21
    # 20 of 21 refresh values sit above the whole reference support
    assert r1.drifted and r1.ks_micro > 900_000
    # refresh continuing the same 1..8 cycle: same distribution, so the
    # statistic stays under the alarm (79/21 aren't cycle multiples, so
    # the empirical CDFs wobble by ~1 step — bounded, not zero)
    assert not r2.drifted and r2.ks_micro < 100_000


# ---------------------------------------------------------------------------
# ts15 interval coverage
# ---------------------------------------------------------------------------


def test_ts15_coverage_cross_checked_against_ts7_intervals(spark):
    """Re-derive coverage per supplier from the raw interval list with a
    set-of-days union in driver python and compare exactly; also pin
    the dual relationships: covered ≤ span, covered ≤ Σ lengths, and
    covered = Σ lengths ⟺ ts7 says max_concurrent == 1."""
    from tests.conftest import SF_DIR

    from apache_iceberg_spark.operators.functions_ext import (
        _shipment_intervals,
    )
    from apache_iceberg_spark.tables import load_table

    iv = _shipment_intervals(load_table(spark, SF_DIR, "lineitem")).collect()
    days, total_len = {}, {}
    for r in iv:
        days.setdefault(r.l_suppkey, set()).update(range(r.sd, r.ed + 1))
        total_len[r.l_suppkey] = total_len.get(r.l_suppkey, 0) + (
            r.ed - r.sd + 1
        )
    out = {
        r.l_suppkey: r
        for r in REGISTRY["ts15_interval_coverage"].spark(spark, SF_DIR).collect()
    }
    conc = {
        r.l_suppkey: r.max_concurrent
        for r in REGISTRY["ts7_max_concurrent_intervals"]
        .spark(spark, SF_DIR)
        .collect()
    }
    def longest_run(dayset):
        best = cur = 0
        prev = None
        for x in sorted(dayset):
            cur = cur + 1 if prev is not None and x == prev + 1 else 1
            best = max(best, cur)
            prev = x
        return best

    assert set(out) == set(days)
    for k, d in days.items():
        assert out[k].covered_days == len(d), k
        assert out[k].longest_busy_run == longest_run(d), k
        assert out[k].covered_days <= out[k].span_days
        assert out[k].covered_days <= total_len[k]
        assert (out[k].covered_days == total_len[k]) == (conc[k] == 1)


# ---------------------------------------------------------------------------
# m27 changelog scan
# ---------------------------------------------------------------------------


def test_m27_changelog_replays_to_v2(spark):
    """The CDC contract: applying the changelog to v1 must reproduce v2
    exactly — drop DELETE/UPDATE_BEFORE keys, add INSERT/UPDATE_AFTER
    rows — and unchanged keys must not appear in the log at all."""
    from tests.conftest import SF_DIR

    from apache_iceberg_spark.tables import load_table

    log = REGISTRY["m27_changelog_scan"].spark(spark, SF_DIR).collect()
    v1 = {
        r.o_orderkey: (r.o_custkey, r.o_orderstatus, r.price_cents)
        for r in load_table(spark, SF_DIR, "orders")
        .selectExpr(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents",
        )
        .collect()
    }
    replay = dict(v1)
    befores = set()
    for r in log:
        row = (r.o_custkey, r.o_orderstatus, r.price_cents)
        if r._change_type in ("DELETE", "UPDATE_BEFORE"):
            assert replay[r.o_orderkey] == row  # before-image is faithful
            if r._change_type == "DELETE":
                del replay[r.o_orderkey]
            else:
                befores.add(r.o_orderkey)
        else:
            replay[r.o_orderkey] = row
    assert befores == {
        k for k in v1 if k % 10 == 0 and k % 100 != 0
    }  # exactly the merge's update keys got a before/after pair
    # replay == v2 re-derived from the same deterministic merge rules
    v2 = {}
    for k, (c, s, p) in v1.items():
        if k % 100 == 0:
            continue
        if k % 10 == 0:
            v2[k] = (c, "X", p)
        else:
            v2[k] = (c, s, p)
        if k % 1000 == 7:
            v2[k + 10000000] = (c, "N", p)
    assert replay == v2


# ---------------------------------------------------------------------------
# ts7 inclusive-interval sweep fix (round-8 code review)
# ---------------------------------------------------------------------------


def test_ts7_touching_intervals_are_not_concurrent(spark, tmp_path):
    """[d1, d2] and [d2+1, d3] share no day, so max_concurrent must be 1
    — the pre-r8 sweep processed +1 before −1 at equal points and
    transiently counted 2 (invisible to the hash gate: the oracle
    replicated the order). Driven through the REGISTERED operator on a
    constructed lineitem (ed = sd + q%28 + 3, the j7 window rule):
    supplier 1 ships [0,4] and [5,9] (touching), supplier 2 ships
    [0,4] and [4,8] (overlapping at day 4)."""
    import datetime

    from apache_iceberg_spark.operators.functions_ext import J7_FROM

    d0 = datetime.datetime.fromisoformat(J7_FROM)

    def ship(supp, ok, ln, sd, q):
        return (supp, ok, ln, d0 + datetime.timedelta(days=sd), float(q))

    rows = [
        ship(1, 1, 1, 0, 1),  # [0, 4]
        ship(1, 2, 1, 5, 1),  # [5, 9]  touching
        ship(2, 3, 1, 0, 1),  # [0, 4]
        ship(2, 4, 1, 4, 1),  # [4, 8]  overlapping
    ]
    spark.createDataFrame(
        rows,
        "l_suppkey long, l_orderkey long, l_linenumber long, "
        "l_shipdate timestamp, l_quantity double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r.l_suppkey: (r.max_concurrent, r.n_intervals)
        for r in REGISTRY["ts7_max_concurrent_intervals"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert got == {1: (1, 2), 2: (2, 2)}


def test_a24_survives_past_bigint_overflow_regime(spark, tmp_path):
    """4M docs in one source: n²·1e6 = 1.6e19 > BIGINT max — the round-8
    review regime where the first-cut BIGINT math wrapped. The
    DECIMAL/HUGEINT form must return the exact floor values."""
    d = str(tmp_path)
    spark.range(4_000_000).selectExpr(
        "id AS doc_id",
        "'' AS text",
        "CASE WHEN id % 4 = 0 THEN 'de' ELSE 'en' END AS lang",
        "'web' AS source",
        "CAST(0 AS BIGINT) AS n_chars",
    ).write.parquet(f"{d}/documents.parquet")
    r = REGISTRY["a24_gini_diversity"].spark(spark, d).collect()[0]
    n = 4_000_000
    ss = (n // 4) ** 2 + (3 * n // 4) ** 2
    assert r.n_docs == n
    assert r.gini_micro == (n * n - ss) * 1_000_000 // (n * n) == 375_000
    assert r.hhi_micro == ss * 1_000_000 // (n * n) == 625_000


def test_changelog_diff_null_payloads(spark):
    """The factored CDC diff on NULL-bearing payloads (round-8 review):
    NULL→value and value→NULL are changes, NULL→NULL is not, and a row
    whose payload is entirely NULL is still present (never misread as
    DELETE/INSERT)."""
    from apache_iceberg_spark.operators.scale import changelog_diff

    before = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None), (4, "keep"), (5, "gone")],
        "k long, v string",
    )
    after = spark.createDataFrame(
        [(1, "now"), (2, None), (3, None), (4, "keep"), (6, None)],
        "k long, v string",
    )
    got = {
        (r.k, r._change_type): r.v
        for r in changelog_diff(before, after, "k", ["v"]).collect()
    }
    assert got == {
        (1, "UPDATE_BEFORE"): None,
        (1, "UPDATE_AFTER"): "now",
        (2, "UPDATE_BEFORE"): "x",
        (2, "UPDATE_AFTER"): None,
        (5, "DELETE"): "gone",
        (6, "INSERT"): None,
    }


def test_ts11_memo_invalidates_on_rewrite(spark, tmp_path):
    """Rewriting the events at the same path must re-run the sizer
    (snapshot-scoped stats, not path-scoped): uniform data picks day
    buckets; after an in-place rewrite with a one-hour burst the same
    path must pick a finer width, not serve the stale day memo."""
    import datetime

    import apache_iceberg_spark.operators.timeseries as ts

    d = str(tmp_path)

    def write(rows):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    t0 = datetime.datetime(2024, 1, 1)
    uniform = [
        (i, t0 + datetime.timedelta(days=i), 1, "click", 1.0, "{}")
        for i in range(10)
    ]
    write(uniform)
    saved = ts.TS11_TARGET_PER_BUCKET
    ts.TS11_TARGET_PER_BUCKET = 4  # tiny target so the fixture can trip it
    try:
        e1 = ts.load_table(spark, d, "events").select(
            "user_id", ts.F.unix_micros("ts").alias("tus")
        )
        w1 = ts._ts11_pick_bucket_us(e1, memo_key=ts._ts11_memo_key(d))
        assert w1 == ts.TS11_LADDER_US[0]  # day
        burst = [
            (i, t0 + datetime.timedelta(seconds=i), 1, "click", 1.0, "{}")
            for i in range(8)
        ]
        write(burst)
        e2 = ts.load_table(spark, d, "events").select(
            "user_id", ts.F.unix_micros("ts").alias("tus")
        )
        w2 = ts._ts11_pick_bucket_us(e2, memo_key=ts._ts11_memo_key(d))
        assert w2 == ts.TS11_LADDER_US[2]  # minute — stale memo would say day
    finally:
        ts.TS11_TARGET_PER_BUCKET = saved


# ---------------------------------------------------------------------------
# dd20 canonical-by-quality
# ---------------------------------------------------------------------------


def test_dd20_elects_best_margin_per_cluster(spark):
    """Every cluster elects exactly one canonical, it carries the
    cluster-max margin (doc_id tiebreak), and singletons are their own
    canonical — cross-checked against dd6's clusters + tx19's margins
    recombined in driver python."""
    from tests.conftest import SF_DIR

    rows = (
        REGISTRY["dd20_canonical_by_quality"].spark(spark, SF_DIR).collect()
    )
    clusters = {}
    for r in rows:
        clusters.setdefault(r.cluster_id, []).append(r)
    dd6 = {
        r.doc_id: r.cluster_id
        for r in REGISTRY["dd6_dup_clusters"].spark(spark, SF_DIR).collect()
    }
    assert len(rows) == 500
    for cid, members in clusters.items():
        canon = [r for r in members if r.is_canonical]
        assert len(canon) == 1, cid
        best = max(members, key=lambda r: (r.margin, -r.doc_id))
        assert canon[0].doc_id == best.doc_id
    # clustered docs carry dd6's assignment; unclustered are singletons
    for r in rows:
        assert r.cluster_id == dd6.get(r.doc_id, r.doc_id)
    assert any(len(m) > 1 for m in clusters.values())  # real clusters exist


def test_pp16_rates_hit_target_ratios(spark):
    """The binding language keeps exactly 1e6 (never upsample), every
    other rate < 1e6, and post-token RATIOS equal the target ratios up
    to the per-lang floor (cross-multiplied within ±1 floor step)."""
    from tests.conftest import SF_DIR

    rows = (
        REGISTRY["pp16_mixture_rebalance_plan"].spark(spark, SF_DIR).collect()
    )
    assert rows, "no languages joined the target"
    assert max(r.keep_rate_micro for r in rows) == 1_000_000
    for a in rows:
        assert 0 < a.keep_rate_micro <= 1_000_000
        assert a.post_tokens == a.keep_rate_micro * a.cur_tokens // 10**6
        for b in rows:
            # post_a/post_b ≈ target_a/target_b: floors shift each side
            # by < 1 token-unit, so cross-products differ by < max target
            lhs = a.post_tokens * b.target_micro
            rhs = b.post_tokens * a.target_micro
            slack = max(a.target_micro, b.target_micro) * 2
            assert abs(lhs - rhs) <= slack, (a.lang, b.lang, lhs, rhs)
