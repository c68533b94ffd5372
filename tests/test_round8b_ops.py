"""Round-8 continuation tests: M4 downsampling (ts16/st18) and the
operators added in the second round-8 session."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


# ---------------------------------------------------------------------------
# ts16 M4 downsampling
# ---------------------------------------------------------------------------


def test_ts16_matches_pandas_model(spark):
    """Independent model: per-(type, bucket) min/max/first/last recomputed
    row-at-a-time in pandas must equal the Spark aggregate (guards against
    the oracle-blind class — both engines agreeing on wrong semantics)."""
    from apache_iceberg_spark.operators.timeseries import TS16_BUCKET_US

    out = (
        REGISTRY["ts16_m4_downsample"].spark(spark, SF_DIR).toPandas()
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["tus"] = ev["ts"].astype("int64") // 1000 if str(
        ev["ts"].dtype
    ).endswith("[ns]") else ev["ts"].astype("int64")
    ev["v_c"] = (ev["value"] * 100).round().astype("int64")
    ev["bucket"] = ev["tus"] // TS16_BUCKET_US
    ev = ev.sort_values(["tus", "event_id"], kind="mergesort")
    model = {}
    for (t, b), g in ev.groupby(["event_type", "bucket"]):
        model[(t, b)] = (
            len(g),
            g["v_c"].min(),
            g["v_c"].max(),
            g["tus"].iloc[0],
            g["v_c"].iloc[0],
            g["tus"].iloc[-1],
            g["v_c"].iloc[-1],
        )
    assert len(out) == len(model)
    for row in out.itertuples(index=False):
        exp = model[(row.event_type, row.bucket)]
        got = (
            row.n_points,
            row.v_min_c,
            row.v_max_c,
            row.first_tus,
            row.first_v_c,
            row.last_tus,
            row.last_v_c,
        )
        assert got == exp, (row.event_type, row.bucket, got, exp)


def test_ts16_output_bounded_by_pixel_budget(spark):
    """THE M4 property: output rows ≤ series × buckets regardless of
    input size (30-day fixture / 6 h = 120 buckets, 5 types)."""
    out = REGISTRY["ts16_m4_downsample"].spark(spark, SF_DIR)
    n = out.count()
    assert n <= 5 * 121  # +1 for a partial trailing bucket
    # sf0.001 is sparse (1k events over 600 slots) — most buckets still hit
    assert n >= 5 * 60


def test_ts16_single_exchange_plan(spark):
    """One shuffle (partial+final hash agg), no sort, no window, no join."""
    plan = (
        REGISTRY["ts16_m4_downsample"]
        .spark(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "Window" not in plan


def test_st18_equals_batch_ts16(spark):
    """Streaming availableNow run must produce exactly the batch answer."""
    cols = [
        "event_type",
        "bucket",
        "n_points",
        "v_min_c",
        "v_max_c",
        "first_tus",
        "first_v_c",
        "last_tus",
        "last_v_c",
    ]
    batch = (
        REGISTRY["ts16_m4_downsample"]
        .spark(spark, SF_DIR)
        .orderBy("event_type", "bucket")
        .toPandas()[cols]
    )
    stream = (
        REGISTRY["st18_stream_m4_downsample"]
        .spark(spark, SF_DIR)
        .orderBy("event_type", "bucket")
        .toPandas()[cols]
    )
    pd.testing.assert_frame_equal(
        batch.reset_index(drop=True),
        stream.reset_index(drop=True),
        check_dtype=False,
    )


# ---------------------------------------------------------------------------
# w12 weighted median
# ---------------------------------------------------------------------------


def test_w12_matches_python_model(spark):
    """Lower weighted median recomputed row-at-a-time: sort by price,
    accumulate weight, first price reaching half the total."""
    out = (
        REGISTRY["w12_weighted_median"].spark(spark, SF_DIR).toPandas()
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["price_c"] = (li["l_extendedprice"] * 100).round().astype("int64")
    li["wt_c"] = (li["l_quantity"] * 100).round().astype("int64")
    for row in out.itertuples(index=False):
        g = li[li["l_returnflag"] == row.l_returnflag].sort_values("price_c")
        tot = int(g["wt_c"].sum())
        assert row.total_weight_centi == tot
        cum = 0
        med = None
        for p, wsum in g.groupby("price_c")["wt_c"].sum().items():
            cum += int(wsum)
            if 2 * cum >= tot:
                med = int(p)
                break
        assert row.median_price_c == med, row.l_returnflag


def test_w12_median_weight_invariant(spark):
    """At least half the mass sits at or below the reported median and
    at least half at or above (the defining property)."""
    out = REGISTRY["w12_weighted_median"].spark(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["price_c"] = (li["l_extendedprice"] * 100).round().astype("int64")
    li["wt_c"] = (li["l_quantity"] * 100).round().astype("int64")
    for row in out.itertuples(index=False):
        g = li[li["l_returnflag"] == row.l_returnflag]
        tot = int(g["wt_c"].sum())
        below = int(g.loc[g["price_c"] <= row.median_price_c, "wt_c"].sum())
        above = int(g.loc[g["price_c"] >= row.median_price_c, "wt_c"].sum())
        assert 2 * below >= tot and 2 * above >= tot


# ---------------------------------------------------------------------------
# dc2 fuzzy decontamination
# ---------------------------------------------------------------------------


def _write_split_docs(spark, tmp_path, docs):
    """Write a documents fixture with CHOSEN doc_ids (the split is a pure
    hash of doc_id, so ids are picked per-split by probing the hash)."""
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _split_of_id(doc_id: int) -> str:
    import hashlib

    h = int(
        hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15], 16
    ) % 100
    return "train" if h < 80 else ("val" if h < 90 else "test")


def test_dc2_flags_planted_near_verbatim_leak(spark, tmp_path):
    """A test doc pasted into train with one word edited must be flagged;
    an unrelated train doc must not be."""
    train_ids = [i for i in range(200) if _split_of_id(i) == "train"]
    test_ids = [i for i in range(200) if _split_of_id(i) == "test"]
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch from a mossy log near the river bend "
        "under a pale winter sky waiting for the tide to turn"
    )
    # an APPENDED word keeps jaccard high (34 vs 33 shingles → 0.97);
    # an in-place substitution kills 5 of ~33 shingles → 0.74 < the gate
    edited = base + " tonight"
    other = (
        "completely unrelated text about distributed query engines "
        "and columnar storage formats with vectorized execution and "
        "late materialization across many independent partitions of data"
    )
    docs = [
        (train_ids[0], edited),
        (train_ids[1], other),
        (test_ids[0], base),
    ]
    sf = _write_split_docs(spark, tmp_path, docs)
    out = (
        REGISTRY["dc2_fuzzy_decontamination"].spark(spark, sf).toPandas()
    )
    assert set(out["doc_id"]) == {train_ids[0]}
    row = out.iloc[0]
    assert row.n_test_matches == 1
    assert row.max_jaccard >= 0.8


def test_dc2_no_cartesian_plan(spark):
    plan = (
        REGISTRY["dc2_fuzzy_decontamination"]
        .spark(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# ---------------------------------------------------------------------------
# ann19 exact radius search
# ---------------------------------------------------------------------------


def _write_embeddings(spark, tmp_path, vecs):
    import numpy as np

    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.asarray(v, dtype="float32") for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_ann19_exact_on_clustered_corpus_with_pruning(spark, tmp_path):
    """The pruning regime ann19 is built for: tight clusters around the
    centroid slots. The bound must prune most (query, cell) pairs while
    the result still equals numpy brute force exactly."""
    import numpy as np

    from apache_iceberg_spark.operators.similarity import (
        ANN19_RADIUS,
        K_CELLS,
        N_QUERIES,
    )

    rng = np.random.default_rng(7)
    dim = 16
    # K_CELLS well-separated unit directions (axes), tiny within-cluster
    # noise -> r_cell ~ 0.1.
    dirs = np.eye(dim)[:K_CELLS]
    vecs = []
    # queries: aligned with cluster 0..4's direction (slightly noisy)
    for i in range(N_QUERIES):
        v = dirs[i % K_CELLS] + rng.normal(0, 0.03, dim)
        vecs.append(v)
    # centroid slots 5..12: exactly the directions
    for c in range(K_CELLS):
        vecs.append(dirs[c] * 1.0)
    # members: 40 per cluster
    for c in range(K_CELLS):
        for _ in range(40):
            vecs.append(dirs[c] + rng.normal(0, 0.05, dim))
    sf = _write_embeddings(spark, tmp_path, vecs)
    out = (
        REGISTRY["ann19_radius_search"]
        .spark(spark, sf)
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    # numpy brute force (float32 storage, float64 math — same as Spark)
    V = np.array(
        [np.asarray(v, dtype="float32").astype("float64") for v in vecs]
    )
    nrm = np.sqrt((V * V).sum(axis=1))
    expected = []
    for q in range(N_QUERIES):
        cos = (V @ V[q]) / (nrm * nrm[q])
        for j in np.nonzero(cos >= ANN19_RADIUS)[0]:
            if j != q:
                expected.append((q, int(j)))
    got = list(zip(out["query_id"], out["neighbor_id"]))
    assert sorted(got) == sorted(expected)
    # every in-cluster member matches (cos ~ 1), cross-cluster none
    assert len(expected) >= N_QUERIES * 40
    # fixture sanity: the bound PRUNES — for each query most cells have
    # q.c + r_cell < radius (orthogonal clusters, r ~ 0.1)
    C = V[N_QUERIES : N_QUERIES + K_CELLS]
    c_nrm = nrm[N_QUERIES : N_QUERIES + K_CELLS]
    surv = 0
    for q in range(N_QUERIES):
        members = V[N_QUERIES + K_CELLS :]
        m_nrm = nrm[N_QUERIES + K_CELLS :]
        # assignment of every vector to max-cosine cell
        a = np.argmax((V @ C.T) / np.outer(nrm, c_nrm), axis=1)
        for c in range(K_CELLS):
            mask = a == c
            cosc = (V[mask] @ C[c]) / (nrm[mask] * c_nrm[c])
            r = np.sqrt(np.maximum(0.0, 2 - 2 * cosc)).max()
            qc = (V[q] @ C[c]) / (nrm[q] * c_nrm[c])
            if qc + r >= ANN19_RADIUS:
                surv += 1
    assert surv <= N_QUERIES * 3  # ≥5 of 8 cells pruned per query


def test_ann19_no_wide_corpus_shuffle(spark):
    """The corpus side must not shuffle: survivors broadcast, no SMJ."""
    plan = (
        REGISTRY["ann19_radius_search"]
        .spark(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# m28 compaction planning
# ---------------------------------------------------------------------------


def test_m28_plan_packs_next_fit(spark):
    """Model check: recompute the per-month next-fit packing from raw
    row counts; every bin's file set and mass must match, and at least
    one bin must merge >1 file (the plan's reason to exist)."""
    from apache_iceberg_spark.operators.scale import M28_TARGET_ROWS

    out = (
        REGISTRY["m28_compaction_plan"].spark(spark, SF_DIR).toPandas()
    )
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["month"] = o["o_orderdate"].dt.strftime("%Y-%m")
    counts = (
        o.groupby(["month", "o_orderpriority"])
        .size()
        .reset_index(name="n")
        .sort_values(["month", "o_orderpriority"])
    )
    model = {}
    for month, g in counts.groupby("month"):
        cum = 0
        for _, r in g.iterrows():
            b = cum // M28_TARGET_ROWS
            key = (month, b)
            nf, tot = model.get(key, (0, 0))
            model[key] = (nf + 1, tot + int(r["n"]))
            cum += int(r["n"])
    got = {
        (r.month, r.bin): (r.n_files, r.total_rows)
        for r in out.itertuples(index=False)
    }
    assert got == model
    assert any(nf > 1 for nf, _ in got.values())


# ---------------------------------------------------------------------------
# tx21 domain blocklist
# ---------------------------------------------------------------------------


def test_tx21_suffix_semantics(spark):
    """Every blocked host must end with its matched rule at a label
    boundary; every io-TLD host must be blocked by the zone rule; hosts
    matching a deeper rule must report the most specific one."""
    out = (
        REGISTRY["tx21_domain_blocklist"].spark(spark, SF_DIR).toPandas()
    )
    assert len(out) > 0
    for r in out.itertuples(index=False):
        assert r.host == r.rule or r.host.endswith("." + r.rule)
    blocked = dict(zip(out["doc_id"], out["rule"]))
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for row in d.itertuples(index=False):
        tld = ["com", "net", "org", "io"][row.doc_id % 4]
        host = f"{row.source}.{row.lang}.example.{tld}"
        expected = None
        for rule in sorted(
            ("example.io", "fr.example.com", "src5.zh.example.net"),
            key=len,
            reverse=True,
        ):
            if host == rule or host.endswith("." + rule):
                expected = rule
                break
        assert blocked.get(row.doc_id) == expected, (host, expected)


# ---------------------------------------------------------------------------
# g7 label propagation
# ---------------------------------------------------------------------------


def test_g7_two_cliques_converge_to_two_communities(spark, tmp_path):
    """Planted structure: two disjoint cliques must each collapse to one
    community (the min node id), matching a pure-python sync LPA."""
    # Build a lineitem/orders fixture producing two supplier cliques:
    # customers 1-3 each buy suppliers 1-4; customers 4-6 buy 11-14.
    rows_o, rows_l, ok = [], [], 0
    for cust, supps in [(c, range(1, 5)) for c in (1, 2, 3)] + [
        (c, range(11, 15)) for c in (4, 5, 6)
    ]:
        for s in supps:
            ok += 1
            rows_o.append((ok, cust))
            rows_l.append((ok, s))
    import datetime

    od = pd.DataFrame(rows_o, columns=["o_orderkey", "o_custkey"])
    ld = pd.DataFrame(rows_l, columns=["l_orderkey", "l_suppkey"])
    spark.createDataFrame(od).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(ld).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = (
        REGISTRY["g7_lpa_communities"]
        .spark(spark, str(tmp_path))
        .toPandas()
        .sort_values("node")
    )
    comm = dict(zip(out["node"], out["community"]))
    assert set(comm) == set(range(1, 5)) | set(range(11, 15))
    # within each clique every neighbor multiset is the clique minus self;
    # after round 1 all labels are the clique minimum (mode tie -> min),
    # and propagation keeps them there
    assert {comm[n] for n in range(1, 5)} == {1}
    assert {comm[n] for n in range(11, 15)} == {11}


def test_g7_python_model_on_fixture(spark):
    """Full sync-LPA model in python over the same kNN edges."""
    from apache_iceberg_spark.operators.graph import G7_ROUNDS, _knn_edges

    edges = _knn_edges(spark, SF_DIR).toPandas()
    nbrs = {}
    for r in edges.itertuples(index=False):
        nbrs.setdefault(r.u, set()).add(r.v)
        nbrs.setdefault(r.v, set()).add(r.u)
    lbl = {n: n for n in nbrs}
    for _ in range(G7_ROUNDS):
        nxt = {}
        for n, ns in nbrs.items():
            counts = {}
            for m in ns:
                counts[lbl[m]] = counts.get(lbl[m], 0) + 1
            nxt[n] = min(
                counts, key=lambda k: (-counts[k], k)
            )
        lbl = nxt
    out = REGISTRY["g7_lpa_communities"].spark(spark, SF_DIR).toPandas()
    got = dict(zip(out["node"], out["community"]))
    assert got == lbl


# ---------------------------------------------------------------------------
# tx22 langid confusion
# ---------------------------------------------------------------------------


def test_tx22_totals_and_diagonal(spark):
    out = (
        REGISTRY["tx22_langid_confusion"].spark(spark, SF_DIR).toPandas()
    )
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert out["n"].sum() == len(d)
    # per-label totals match the corpus label counts
    lt = out.groupby("lang_label")["n"].sum().to_dict()
    assert lt == d["lang"].value_counts().to_dict()
    # rates are exact floor micro-shares: per label they sum to <= 1e6
    # and within n_cells of it
    for lbl, g in out.groupby("lang_label"):
        s = g["cell_rate_micro"].sum()
        assert 1_000_000 - len(g) < s <= 1_000_000


# ---------------------------------------------------------------------------
# a26 Benford profile
# ---------------------------------------------------------------------------


def test_a26_counts_and_pinned_shares(spark):
    import math

    out = REGISTRY["a26_benford_profile"].spark(spark, SF_DIR).toPandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    cents = cents[o["o_totalprice"] > 0]
    lead = cents.astype(str).str[0].astype(int)
    exp = lead.value_counts().to_dict()
    got = dict(zip(out["d"], out["n"]))
    assert got == exp
    # pinned literals really are round(1e6 * log10(1+1/d))
    for r in out.itertuples(index=False):
        assert r.benford_micro == round(1_000_000 * math.log10(1 + 1 / r.d))
    assert out["n"].sum() == len(cents)
