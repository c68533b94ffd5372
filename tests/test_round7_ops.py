"""Round-7 regression tests: persist-lifecycle convention (VERDICT r6
ask #3), tx15 cache-leak regression, ann14/st13 full-outer drift join
(ADVICE r6), and the new round-7 operators."""

from __future__ import annotations

import ast
import glob
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

PKG = os.path.join(os.path.dirname(__file__), "..", "apache_iceberg_spark")


# ---------------------------------------------------------------------------
# Persist-lifecycle convention (VERDICT r6 ask #3)
# ---------------------------------------------------------------------------


def _persist_report():
    """For every function in the package: (file, func, n_persist,
    n_unpersist, has_plan_cache_marker)."""
    rows = []
    for path in sorted(
        glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True)
    ):
        src = open(path).read()
        tree = ast.parse(src)
        lines = src.splitlines()
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            seg = "\n".join(lines[node.lineno - 1 : node.end_lineno])
            n_p = n_u = 0
            for sub in ast.walk(node):
                if isinstance(sub, ast.Call) and isinstance(
                    sub.func, ast.Attribute
                ):
                    if sub.func.attr in ("persist", "cache"):
                        n_p += 1
                    elif sub.func.attr == "unpersist":
                        n_u += 1
            if n_p or n_u:
                rows.append(
                    (
                        os.path.relpath(path, PKG),
                        node.name,
                        n_p,
                        n_u,
                        "plan-cache" in seg,
                    )
                )
    return rows


def test_persist_sites_released_or_justified():
    """Every function that persists a frame must either unpersist at
    least as many frames as it persists, or carry a ``# plan-cache``
    marker certifying the cache is a multi-consumer frame referenced by
    the RETURNED lazy plan (released by the caller via
    ``session.release_plan_caches``). This is the structural form of
    VERDICT r6 ask #3's 33-persist/9-unpersist audit: a new leaky
    persist cannot land without either a release or a justification."""
    bad = [
        (f, fn, n_p, n_u)
        for f, fn, n_p, n_u, marked in _persist_report()
        if n_p > n_u and not marked
    ]
    assert not bad, f"unreleased, unjustified persists: {bad}"


def test_persist_report_is_nonempty():
    # the audit must actually be looking at something
    assert len(_persist_report()) >= 10


def test_tx15_releases_all_cached_frames(spark):
    """tx15 regression (ADVICE r6): the BPE merge loop must leave ZERO
    cached frames behind — each round's vocab is unpersisted once the
    next round's is materialized, and the returned frame is built from
    driver-side literals so even the final vocab is released."""
    from tests.conftest import SF_DIR

    sc = spark.sparkContext
    spark.catalog.clearCache()
    before = sc._jsc.sc().getPersistentRDDs().size()
    out = REGISTRY["tx15_bpe_merges"].spark(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    after = sc._jsc.sc().getPersistentRDDs().size()
    assert after == before, f"tx15 leaked {after - before} cached frames"


# ---------------------------------------------------------------------------
# ann14/st13 full-outer drift join (ADVICE r6)
# ---------------------------------------------------------------------------


def test_ann14_reports_batch_only_cells(spark):
    """A trained cell that lost every member in the final re-assignment
    but receives batch vectors must still appear in the drift report
    with n_existing = 0 (full outer, not left)."""
    from apache_iceberg_spark.operators import similarity as sim

    stored = spark.createDataFrame(
        [(0, 5), (1, 3)], "cell_id INT, n_existing BIGINT"
    )
    added = spark.createDataFrame(
        [(1, 2, 10), (7, 4, 20)],
        "cell_id INT, n_added BIGINT, added_inertia_micro BIGINT",
    )
    # replicate ann14's closing join exactly
    out = (
        stored.join(added, "cell_id", "full")
        .select(
            "cell_id",
            F.coalesce("n_existing", F.lit(0)).alias("n_existing"),
            F.coalesce("n_added", F.lit(0)).alias("n_added"),
            F.coalesce("added_inertia_micro", F.lit(0)).alias(
                "added_inertia_micro"
            ),
        )
        .collect()
    )
    got = {r["cell_id"]: (r["n_existing"], r["n_added"]) for r in out}
    assert got == {0: (5, 0), 1: (3, 2), 7: (0, 4)}
    # and the real operator's plan contains a FullOuter join
    plan = (
        REGISTRY["ann14_incremental_index_update"]
        .spark(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "FullOuter" in plan
    assert sim is not None


# ---------------------------------------------------------------------------
# ann15 — index lifecycle decision (VERDICT r6 ask #5)
# ---------------------------------------------------------------------------


def _write_embeddings(spark, path, rows):
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def test_ann15_fixture_takes_no_retrain_branch(spark):
    """On the fixture the batch is ~1/3 of the stored corpus (below the
    1/2 growth threshold) and iid with it (no drift), so the decision
    must be retrain=False, every row carries the same global flag, and
    the post state still covers the full corpus under the OLD index."""
    from tests.conftest import SF_DIR

    out = REGISTRY["ann15_index_lifecycle"].spark(spark, SF_DIR).collect()
    assert all(not r["retrain"] for r in out)
    assert sum(r["post_n"] for r in out) == 500
    assert sum(r["n_existing"] for r in out) + sum(
        r["n_added"] for r in out
    ) == 500
    # no retrain → serving index unchanged → post = existing + added
    for r in out:
        assert r["post_n"] == r["n_existing"] + r["n_added"]


def test_ann15_drifted_batch_triggers_retrain(spark, tmp_path):
    """Retrain branch: the batch sits far off every trained centroid
    (an offset added to each component), so its per-cell mean inertia
    dwarfs the trained mean — cell_drift fires, retrain=True, and the
    retrained full-corpus quantizer serves with LOWER total inertia
    than the stale existing-only index would have."""
    import random

    from apache_iceberg_spark.operators.similarity import (
        DIM,
        _cell_stats,
        ann14_trained_index,
    )

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(8)]
    rows = []
    # stored: 97 vectors in 8 tight clusters around the seeds
    # (max vec_id 128 → t0 = 96: vec_ids 0..95 stored, 96..128 batch)
    for i in range(96):
        c = base[i % 8]
        rows.append(
            (i, [float(x + rng.uniform(-1e-3, 1e-3)) for x in c], i % 8)
        )
    # batch: same clusters SHIFTED by +3 per component — off-distribution
    for i in range(96, 129):
        c = base[i % 8]
        rows.append(
            (i, [float(x + 3.0 + rng.uniform(-1e-3, 1e-3)) for x in c],
             i % 8)
        )
    _write_embeddings(spark, str(tmp_path), rows)
    got = REGISTRY["ann15_index_lifecycle"].spark(
        spark, str(tmp_path)
    ).collect()
    assert any(r["cell_drift"] for r in got)
    assert all(r["retrain"] for r in got)
    assert sum(r["post_n"] for r in got) == 129
    # the retrained index must fit the full corpus at least as well as
    # the stale one
    t0, cents1, argmin1, _ = ann14_trained_index(spark, str(tmp_path))
    from apache_iceberg_spark.tables import load_table

    v = load_table(spark, str(tmp_path), "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
    )
    stale = _cell_stats(v, cents1, argmin1, "n", "im").agg(
        F.sum("im")
    ).first()[0]
    assert sum(r["post_inertia_micro"] for r in got) <= stale


def test_ann15_decision_consistent_with_report(spark):
    """The emitted retrain flag must equal the decision recomputed from
    the emitted report columns — the decision table is self-auditing."""
    from tests.conftest import SF_DIR

    from apache_iceberg_spark.operators.similarity import (
        ANN15_GROWTH_DEN,
        ANN15_GROWTH_NUM,
    )

    out = REGISTRY["ann15_index_lifecycle"].spark(spark, SF_DIR).collect()
    want = any(r["cell_drift"] for r in out) or (
        sum(r["n_added"] for r in out) * ANN15_GROWTH_DEN
        > sum(r["n_existing"] for r in out) * ANN15_GROWTH_NUM
    )
    assert all(r["retrain"] == want for r in out)
