"""One-off 10x scale validation of the size-gated cutover constants
(VERDICT r5 ask #7).

The driver branches (CC union-find under _CC_DRIVER_EDGES, g3's rank
vector under G3_DRIVER_NODES) were tuned at sf0.1. This probe forces
BOTH branches of each operator on graphs around and well above the
cutover — synthetic edges at several sizes for CC, a 10x-replicated
sf0.1 trade graph for PageRank — and records wall-times proving each
cutover sits on the right side at 10x the bench data. Results go to
SCALE_NOTES.md (run: python tools/scale_probe.py).

Nothing here touches /root/testdata; the 10x inputs are derived
in-memory (key-shifted unions of the sf0.1 tables).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"


def synthetic_pairs(spark, n_edges: int, n_nodes: int):
    """Deterministic pseudo-random undirected pair list: edge i connects
    (i*2654435761 % n) -- (i*40503 + 17 % n), doc_id_a < doc_id_b kept."""
    return (
        spark.range(n_edges)
        .select(
            (F.col("id") * 2654435761 % n_nodes).alias("x"),
            ((F.col("id") * 40503 + 17) % n_nodes).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("doc_id_a"),
            F.greatest("x", "y").alias("doc_id_b"),
        )
        .distinct()
    )


def time_cc(spark, n_edges: int, force_driver: bool) -> float:
    import apache_iceberg_spark.operators.dedup as dd

    saved = dd._CC_DRIVER_EDGES
    dd._CC_DRIVER_EDGES = 1 << 60 if force_driver else 0
    try:
        pairs = synthetic_pairs(spark, n_edges, n_edges // 2)
        t0 = time.time()
        n = dd.min_label_components(spark, pairs).count()
        dt = time.time() - t0
    finally:
        dd._CC_DRIVER_EDGES = saved
    print(
        f"  CC edges~{n_edges:>9,} branch={'driver' if force_driver else 'distributed'}"
        f" labels={n:,} wall={dt:6.2f}s",
        flush=True,
    )
    return dt


def replicated_trade_graph(spark, copies: int):
    """The sf0.1 trade graph replicated with key offsets — ~10x nodes and
    edges, the shape sf1 would have."""
    l = spark.read.parquet(f"{SF01}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{SF01}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    ls, os_ = [], []
    for k in range(copies):
        ls.append(
            l.select(
                (F.col("l_orderkey") + F.lit(k * 10_000_000)).alias("l_orderkey"),
                (F.col("l_suppkey") + F.lit(k * 1_000_000)).alias("l_suppkey"),
            )
        )
        os_.append(
            o.select(
                (F.col("o_orderkey") + F.lit(k * 10_000_000)).alias("o_orderkey"),
                (F.col("o_custkey") + F.lit(k * 1_000_000)).alias("o_custkey"),
            )
        )
    lu, ou = ls[0], os_[0]
    for x in ls[1:]:
        lu = lu.unionAll(x)
    for x in os_[1:]:
        ou = ou.unionAll(x)
    return lu, ou


def time_g3_rounds(spark, copies: int, force_driver: bool, rounds: int) -> float:
    """Per-round wall time of g3's loop on the ~copies x sf0.1 graph,
    forced onto one branch, capped at `rounds` power steps."""
    import apache_iceberg_spark.operators.graph as g

    lu, ou = replicated_trade_graph(spark, copies)
    pairs = (
        lu.join(ou, lu["l_orderkey"] == ou["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    from pyspark.sql import Window

    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("c").alias("src_kind"), F.col("c").alias("src"),
                    F.lit("s").alias("dst_kind"), F.col("s").alias("dst"),
                ),
                F.struct(
                    F.lit("s").alias("src_kind"), F.col("s").alias("src"),
                    F.lit("c").alias("dst_kind"), F.col("c").alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src_kind", "e.src", "e.dst_kind", "e.dst")
    edges_deg = edges.withColumn(
        "outdeg", F.count("*").over(Window.partitionBy("src_kind", "src"))
    ).persist()

    rank = g._power_step(edges_deg, None).persist()
    n_nodes = rank.count()
    t0 = time.time()
    if force_driver:
        out = g._g3_small_graph_loop(
            spark, edges_deg, rank, max_rounds=rounds, converge=False
        )
    else:
        out = g._g3_distributed_loop(
            edges_deg, rank, max_rounds=rounds, converge=False
        )
    n = out.count()
    dt = time.time() - t0
    per_round = dt / max(rounds - 1, 1)
    print(
        f"  g3 {copies}x sf0.1 nodes={n_nodes:,}"
        f" branch={'driver' if force_driver else 'distributed'}"
        f" rounds={rounds} wall={dt:6.2f}s per-round={per_round:5.2f}s"
        f" (suppliers={n:,})",
        flush=True,
    )
    edges_deg.unpersist()
    rank.unpersist()
    return per_round


def time_ewma(spark, n_hot: int, variant: str) -> float:
    """ts10 (sequential per-key collect_list fold) vs ts11 (segmented
    two-level affine-map fold) on a power-law fixture: ONE hot user with
    n_hot events spread over 30 days next to 100 cold users x 10 events
    (VERDICT r6 ask #6's hot-key ceiling, measured). The fixture is
    built distributed via spark.range (never a driver-side list) and
    written to a temp dir; both variants then run their REGISTERED
    query end-to-end."""
    import tempfile

    from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    base_us = 1_700_000_000_000_000
    span_us = 30 * 86_400_000_000
    step = max(span_us // max(n_hot, 1), 1)
    hot = spark.range(n_hot).select(
        F.col("id").alias("event_id"),
        F.lit(1).cast("long").alias("user_id"),
        F.timestamp_micros(
            (F.lit(base_us) + F.col("id") * F.lit(step)).cast("long")
        ).alias("ts"),
        F.lit("view").alias("event_type"),
        (((F.col("id") * 2654435761) % 10000) / 100.0).alias("value"),
    )
    cold = spark.range(1000).select(
        (F.col("id") + n_hot).alias("event_id"),
        (2 + F.col("id") % 100).cast("long").alias("user_id"),
        F.timestamp_micros(
            (F.lit(base_us) + F.col("id") * F.lit(3_600_000_000)).cast("long")
        ).alias("ts"),
        F.lit("view").alias("event_type"),
        (((F.col("id") * 40503) % 10000) / 100.0).alias("value"),
    )
    d = tempfile.mkdtemp(prefix="ewma_probe_")
    hot.unionByName(cold).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    if variant == "ts11h":
        # force hour buckets (bypassing the r8 auto-sizer): the segment
        # width is THE knob that moves ts11's per-task ceiling (the Spark
        # fn reads the module constant at call time; the DuckDB oracle is
        # not used here)
        import apache_iceberg_spark.operators.timeseries as tsm

        tsm.TS11_FORCE_BUCKET_US = 3_600_000_000
    name = "ts10_ewma" if variant == "ts10" else "ts11_ewma_segmented"
    t0 = time.time()
    # .count() would let Catalyst PRUNE the unused fold column — force
    # the smoothing computation by aggregating over its result.
    row = (
        REGISTRY[name]
        .spark(spark, d)
        .agg(
            F.count("*").alias("n"),
            F.sum("ewma_cents").alias("s"),
            F.sum("n_events").alias("ne"),
        )
        .first()
    )
    n = row["n"]
    dt = time.time() - t0
    print(
        f"  ewma hot-key={n_hot:>10,} variant={variant}"
        f" wall={dt:6.2f}s (users={n:,})",
        flush=True,
    )
    return dt


def time_bpe(spark, n_words: int, branch: str) -> float:
    """Merge-round cost of the BPE trainer vs vocabulary size (VERDICT
    r7 ask #1's scale probe): a synthetic corpus with n_words DISTINCT
    8-letter pseudo-random words (one per doc — frequency skew does not
    change the loop's cost model, only the argmax winners) is written to
    a temp dir, then tx15's REGISTERED training path runs forced onto
    one branch of the TX15_DRIVER_VOCAB gate. branch='driver' runs the
    full 64-merge incremental loop; branch='dist' runs 4 distributed
    rounds (per-round cost is what matters — each round is one argmax
    job + one fold-rewrite materialization at ANY round count)."""
    import tempfile

    import apache_iceberg_spark.operators.text as tx

    d = tempfile.mkdtemp(prefix="bpe_probe_")
    spark.range(n_words).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws('', transform(sequence(0, 7), "
            "j -> char(97 + pmod(hash(id, j), 26))))"
        ).alias("text"),
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    saved = tx.TX15_DRIVER_VOCAB
    tx.TX15_DRIVER_VOCAB = (1 << 60) if branch == "driver" else 0
    n_merges = 64 if branch == "driver" else 4
    try:
        t0 = time.time()
        merges, n_vocab = tx._tx15_train(spark, d, n_merges=n_merges)
        dt = time.time() - t0
    finally:
        tx.TX15_DRIVER_VOCAB = saved
    print(
        f"  bpe vocab={n_vocab:>10,} branch={branch} merges={len(merges)}"
        f" wall={dt:6.2f}s per-round={dt / max(len(merges), 1):6.3f}s",
        flush=True,
    )
    return dt


def time_g5(spark, n_hub: int, variant: str, hops: int = 8) -> float:
    """Per-hop cost of bounded BFS: delta-frontier (round 8) vs the r7
    settled-reaggregation form, on the adversarial-but-realistic shape
    where they diverge — a hub that settles n_hub nodes at hop 1
    followed by a chain tail that keeps the loop running. The frontier
    form touches ~1 node/round after round 1; the settled form re-joins
    and re-aggregates all n_hub settled nodes EVERY round."""
    from pyspark.sql import functions as F

    hub = spark.range(1, n_hub).selectExpr("0 AS src", "id AS dst")
    chain = spark.range(hops).selectExpr(
        f"CASE WHEN id = 0 THEN 0 ELSE {n_hub} + id - 1 END AS src",
        f"{n_hub} + id AS dst",
    )
    e = hub.unionAll(chain)
    adj = e.unionAll(e.selectExpr("dst AS src", "src AS dst")).localCheckpoint()
    seeds = spark.createDataFrame([(0, 0)], "node long, dist long")
    t0 = time.time()
    if variant == "frontier":
        from apache_iceberg_spark.operators.graph import _g5_layers

        total = sum(lay.count() for lay in _g5_layers(adj, seeds, hops))
    else:  # the round-7 shape, verbatim semantics
        d = seeds
        for _ in range(hops):
            step = d.join(adj, d["node"] == adj["src"]).select(
                F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
            )
            d = (
                d.unionByName(step)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=False)
            )
        total = d.count()
    dt = time.time() - t0
    print(
        f"  g5 hub={n_hub:>12,} hops={hops} variant={variant:>8}"
        f" reached={total:,} wall={dt:6.2f}s per-hop={dt / hops:6.3f}s",
        flush=True,
    )
    return dt


def time_dd19(spark, replicas: int, variant: str) -> float:
    """dd19's span shuffle A/B (round 8): spans ride the two shuffles
    (dup-count groupBy + dup-flag join) either as raw ~50-byte strings
    or as 60-bit md5 hashes. The hash spends map-side CPU (one md5 per
    span) to cut per-row shuffle width ~6x — a win when shuffle is
    disk/network-bound (any real cluster), muted on a single-JVM
    local[] where shuffle stays in page cache. Corpus = key-shifted
    replicas of sf0.1 documents (5k docs each)."""
    from apache_iceberg_spark.operators.dedup import (
        _DD19_SPARK_SPANS,
        _SPARK_TOKENS,
    )
    from apache_iceberg_spark.operators.text import SPARK_HEX2INT
    from apache_iceberg_spark.tables import load_table

    base = load_table(spark, SF01, "documents").select("doc_id", "text")
    docs = base
    for r in range(1, replicas):
        docs = docs.unionAll(
            base.select((F.col("doc_id") + 5000 * r).alias("doc_id"), "text")
        )
    spans = docs.select(
        "doc_id",
        F.explode(
            F.expr(_DD19_SPARK_SPANS.replace("toks", f"({_SPARK_TOKENS})"))
        ).alias("g"),
    )
    if variant == "hash":
        spans = spans.select(
            "doc_id", F.expr(SPARK_HEX2INT.format(s="g")).alias("k")
        )
        width = spans.select(F.lit(8).alias("w"))
    else:
        spans = spans.select("doc_id", F.col("g").alias("k"))
        width = spans.select(F.length("k").alias("w"))
    t0 = time.time()
    dup = (
        spans.groupBy("k")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("k", F.lit(1).alias("is_dup"))
    )
    n = (
        spans.join(dup, "k", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("is_dup").isNotNull(), 1).otherwise(0)).alias(
                "n_dup"
            ),
        )
        .count()
    )
    dt = time.time() - t0
    avg_w = width.agg(F.avg("w")).collect()[0][0]
    print(
        f"  dd19 docs~{5000 * replicas:>9,} variant={variant:>6}"
        f" rows={n:,} wall={dt:6.2f}s shuffle-key-bytes/row~{avg_w:.1f}",
        flush=True,
    )
    return dt


def time_tx20(spark, n_tokens: int) -> None:
    """tx20's Heaps/pruning evidence (round 8): distinct-bigram table
    size with and without singleton pruning on a Zipf(1) corpus (the
    sf0.1 fixture's closed ~1k-bigram vocabulary never produces
    singletons, so the probe synthesizes the realistic long tail:
    token i's rank = pow(V, u_i) with u_i uniform in [0,1) —
    log-uniform ranks, i.e. p(rank r) ∝ 1/r, Zipf(1) over a 1M-word
    vocabulary with full distinct support, 100-token docs). The pruned table
    is what every doc-bigram joins against; its sublinearity + the
    singleton share are the operator's scaling argument."""
    V = 1_000_000
    # window-free bigram build: pair token i with token i+1 via a shifted
    # self-join on the global position (cheaper than a per-doc window for
    # a probe; the operator itself works on array columns)
    a = spark.range(n_tokens).select(
        F.col("id").alias("i"),
        (F.abs(F.xxhash64("id")) % V).alias("u"),  # aperiodic draw: an
        # LCG (i·K mod V) has period V, so a 2V-token corpus repeats
        # every sequence exactly and singletons vanish structurally
    )
    w1 = a.select(
        "i",
        F.expr(f"CAST(POW({V}, u / {V}) AS LONG)").alias("w"),
        (F.col("i") / 100).cast("long").alias("doc_id"),
    )
    w2 = w1.select((F.col("i") - 1).alias("i"), F.col("w").alias("wn"),
                   F.col("doc_id").alias("doc2"))
    pairs = w1.join(w2, ["i"]).filter(F.col("doc_id") == F.col("doc2"))
    bgk = pairs.select(
        F.concat_ws(" ", F.col("w").cast("string"),
                    F.col("wn").cast("string")).alias("b")
    )
    t0 = time.time()
    counts = bgk.groupBy("b").agg(F.count("*").alias("c")).persist()
    n_all = counts.count()
    n_kept = counts.filter(F.col("c") >= 2).count()
    dt = time.time() - t0
    counts.unpersist()
    print(
        f"  tx20 tokens~{n_tokens:>12,} distinct-bigrams={n_all:,}"
        f" pruned-table={n_kept:,}"
        f" (singletons dropped: {100 * (n_all - n_kept) / max(n_all, 1):.0f}%)"
        f" wall={dt:6.2f}s",
        flush=True,
    )


def time_ts14(spark, replicas: int) -> float:
    """ts14's zero-corpus-shuffle claim (round 8): the event stream is
    scanned, joined against two BROADCAST frames (profile cells,
    per-type moments) and never exchanged — so wall time should grow
    ~linearly with replicas while the two aggregation exchanges stay
    cell-sized. Corpus = event_id-shifted replicas of sf0.1 events
    (100k rows each)."""
    from apache_iceberg_spark.operators.timeseries import TS14_K
    from apache_iceberg_spark.tables import load_table

    base = load_table(spark, SF01, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    e = base
    for r in range(1, replicas):
        e = e.unionAll(
            base.select(
                (F.col("event_id") + 100_000 * r).alias("event_id"),
                "event_type",
                "ts",
                "value",
            )
        )
    v = e.select(
        "event_id",
        "event_type",
        F.hour("ts").alias("hr"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    t0 = time.time()
    prof = v.groupBy("event_type", "hr").agg(
        F.expr("CAST(SUM(v) AS BIGINT) DIV CAST(COUNT(*) AS BIGINT)").alias(
            "seasonal_centi"
        )
    )
    r_ = v.join(F.broadcast(prof), ["event_type", "hr"]).select(
        "event_id",
        "event_type",
        (F.col("v") - F.col("seasonal_centi")).alias("resid_centi"),
    ).persist()
    dec = "decimal(38,0)"
    mom = r_.groupBy("event_type").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("resid_centi").cast(dec)).cast(dec).alias("s1"),
        F.sum((F.col("resid_centi") * F.col("resid_centi")).cast(dec))
        .cast(dec)
        .alias("s2"),
    )
    a = F.expr("n * CAST(resid_centi AS DECIMAL(38,0)) - s1")
    n_anom = (
        r_.join(F.broadcast(mom), "event_type")
        .filter(a * a > F.lit(TS14_K * TS14_K) * F.expr("n * s2 - s1 * s1"))
        .count()
    )
    dt = time.time() - t0
    r_.unpersist()
    print(
        f"  ts14 events~{100_000 * replicas:>12,} anomalies={n_anom:,}"
        f" wall={dt:6.2f}s",
        flush=True,
    )
    return dt


def time_ts16(spark, replicas: int) -> float:
    """ts16's bounded-output claim (round 8, second session): M4 output
    is series x buckets (600 rows on the 30-day fixture) REGARDLESS of
    input rows, and the plan is one partial+final hash agg — so wall
    should track scan bandwidth while the single exchange carries ~600
    rows per partition at any replica count. Corpus = event_id-shifted
    replicas of sf0.1 events."""
    from apache_iceberg_spark.operators.timeseries import (
        TS16_BUCKET_US,
        _floor_div,
    )
    from apache_iceberg_spark.tables import load_table

    base = load_table(spark, SF01, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    e = base
    for r in range(1, replicas):
        e = e.unionAll(
            base.select(
                (F.col("event_id") + 100_000 * r).alias("event_id"),
                "event_type",
                "ts",
                "value",
            )
        )
    pts = e.select(
        "event_type",
        F.expr(_floor_div("unix_micros(ts)", TS16_BUCKET_US)).alias("bucket"),
        F.unix_micros(F.col("ts")).alias("tus"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    t0 = time.time()
    n_out = (
        pts.groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n_points"),
            F.min("v_c").alias("v_min_c"),
            F.max("v_c").alias("v_max_c"),
            F.min(F.struct("tus", "event_id", "v_c")).alias("f"),
            F.max(F.struct("tus", "event_id", "v_c")).alias("l"),
        )
        .count()
    )
    dt = time.time() - t0
    print(
        f"  ts16 events~{100_000 * replicas:>12,} out-rows={n_out}"
        f" wall={dt:6.2f}s",
        flush=True,
    )
    return dt


def time_lttb(spark, replicas: int) -> float:
    """ts17's bounded-fold claim (round 9): the cross-bucket recurrence
    only ever moves |series| rows through the driver per step, so wall
    should track the corpus-scale pieces (the row_number window + the
    per-bucket struct-max) while the fold cost stays constant. Corpus =
    event_id-shifted replicas of sf0.1 events written to a temp dir, the
    REGISTERED ts17 then runs end-to-end."""
    import tempfile

    from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded
    from apache_iceberg_spark.tables import load_table

    _ensure_loaded()
    base = load_table(spark, SF01, "events")
    e = base
    for r in range(1, replicas):
        e = e.unionAll(
            base.withColumn(
                "event_id", F.col("event_id") + 100_000 * r
            )
        )
    d = tempfile.mkdtemp(prefix="lttb_probe_")
    e.write.parquet(f"{d}/events.parquet")
    t0 = time.time()
    n = REGISTRY["ts17_lttb_downsample"].spark(spark, d).count()
    dt = time.time() - t0
    print(
        f"  lttb replicas={replicas} rows={replicas * 100_000:,} "
        f"out={n} wall={dt:6.2f}s",
        flush=True,
    )
    return dt


def main() -> None:
    """Usage: scale_probe.py cc <n_edges> <driver|dist>
              scale_probe.py g3 <copies> <driver|dist> [rounds]
              scale_probe.py ewma <n_hot_events> <ts10|ts11>
              scale_probe.py bpe <n_distinct_words> <driver|dist>
              scale_probe.py g5 <hub_nodes> <settled|frontier> [hops]
              scale_probe.py dd19 <replicas> <hash|string>
              scale_probe.py tx20 <n_tokens> -
              scale_probe.py ts14 <replicas> -
              scale_probe.py ts16 <replicas> -
              scale_probe.py lttb <replicas> -

    One measurement per invocation so a slow branch (the point of the
    probe is that the wrong branch IS slow) cannot starve the others."""
    from apache_iceberg_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("scale-probe", cpus=cpus)
    kind, size, branch = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    force_driver = branch == "driver"
    if kind == "cc":
        time_cc(spark, size, force_driver)
    elif kind == "dd19":
        time_dd19(spark, size, branch)
    elif kind == "tx20":
        time_tx20(spark, size)
    elif kind == "ts14":
        time_ts14(spark, size)
    elif kind == "ts16":
        time_ts16(spark, size)
    elif kind == "lttb":
        time_lttb(spark, size)
    elif kind == "ewma":
        time_ewma(spark, size, branch)
    elif kind == "bpe":
        time_bpe(spark, size, branch)
    elif kind == "g5":
        hops = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        time_g5(spark, size, branch, hops=hops)
    else:
        rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 6
        time_g3_rounds(spark, size, force_driver, rounds=rounds)


if __name__ == "__main__":
    main()

