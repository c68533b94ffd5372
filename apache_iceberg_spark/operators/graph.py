"""Graph / link-analysis operators.

The reference has no graph surface; this extends the engine's iterative-
algorithm family beyond dd6's connected components with PageRank-style
centrality — the other canonical "loop over a self-join" shape. Like
ann7's k-means, the iterations are UNROLLED (two power steps) so the
whole computation is one lazy plan with a plain SQL oracle, and every
cross-row accumulation runs in exact integer micro-units so the result
is bitwise identical on both engines. Production runs the identical
per-iteration plan to convergence (dd6's driver loop pattern).

Scale shape per iteration: one join of the rank frame onto the edge
list (both hash-partitioned on the source node — at 100 TB the edge
list is bucketed by src so the join is co-located) and one partial+final
aggregate on the destination. Nothing else shuffles; degrees are
computed once and carried with the rank frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_spark.registry import register
from apache_iceberg_spark.tables import load_table, load_table_parallel

#: Initial rank mass per node, in micro-units (1.0 == 1_000_000).
PR_MICRO = 1_000_000
#: Damping factor 0.85 expressed exactly as integer arithmetic:
#: r' = 0.15 + 0.85 * in_mass  ==  150_000 + (85 * in_mass) DIV 100.
PR_BASE_MICRO = 150_000


@register(
    "g1_pagerank",
    oracle=f"""
        WITH edges0 AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        edges AS (
            SELECT 'c' AS src_kind, c AS src, 's' AS dst_kind, s AS dst
            FROM edges0
            UNION ALL
            SELECT 's', s, 'c', c FROM edges0
        ),
        deg AS (
            SELECT src_kind, src, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src_kind, src
        ),
        r1 AS (
            SELECT e.dst_kind AS kind, e.dst AS node,
                   {PR_BASE_MICRO} + (85 * CAST(SUM(
                       {PR_MICRO} // d.outdeg) AS BIGINT)) // 100
                       AS rank_micro
            FROM edges e
            JOIN deg d ON d.src_kind = e.src_kind AND d.src = e.src
            GROUP BY e.dst_kind, e.dst
        ),
        r2 AS (
            SELECT e.dst_kind AS kind, e.dst AS node,
                   {PR_BASE_MICRO} + (85 * CAST(SUM(
                       r.rank_micro // d.outdeg) AS BIGINT)) // 100
                       AS rank_micro
            FROM edges e
            JOIN deg d ON d.src_kind = e.src_kind AND d.src = e.src
            JOIN r1 r ON r.kind = e.src_kind AND r.node = e.src
            GROUP BY e.dst_kind, e.dst
        )
        SELECT r2.node AS l_suppkey, r2.rank_micro,
               d.outdeg AS n_links
        FROM r2 JOIN deg d ON d.src_kind = 's' AND d.src = r2.node
        WHERE r2.kind = 's'
    """,
    doc="PageRank centrality, two power iterations unrolled, over the "
    "bipartite customer<->supplier trade graph (distinct "
    "(custkey, suppkey) pairs from lineitem x orders, edges in both "
    "directions): rank mass starts uniform, each step sends "
    "rank/outdegree along every edge and damps by 0.85 — all in exact "
    "integer micro-units (floor division, identical on both engines), "
    "so the oracle matches bitwise where floating PageRank could not. "
    "Suppliers central to many well-connected customers surface first "
    "— the link-analysis dual of dd6's connected components, and the "
    "second member (after ann7) of the unrolled-iteration family "
    "whose per-step plan is what a convergence loop runs at 100 TB.",
    tags=("graph", "iterative", "centrality"),
)
def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table_parallel(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pairs = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        F.lit("c").alias("src_kind"),
        F.col("c").alias("src"),
        F.lit("s").alias("dst_kind"),
        F.col("s").alias("dst"),
    ).unionByName(
        pairs.select(
            F.lit("s").alias("src_kind"),
            F.col("s").alias("src"),
            F.lit("c").alias("dst_kind"),
            F.col("c").alias("dst"),
        )
    )
    deg = edges.groupBy("src_kind", "src").agg(F.count("*").alias("outdeg"))

    def power_step(rank: DataFrame | None) -> DataFrame:
        """One damped PageRank step; ``rank=None`` means the uniform
        initial mass (saves the first join)."""
        e = edges.join(deg, ["src_kind", "src"])
        if rank is None:
            contrib = F.expr(f"CAST({PR_MICRO} AS BIGINT) DIV outdeg")
        else:
            e = e.join(
                rank.select(
                    F.col("kind").alias("src_kind"),
                    F.col("node").alias("src"),
                    "rank_micro",
                ),
                ["src_kind", "src"],
            )
            contrib = F.expr("rank_micro DIV outdeg")
        return (
            e.select(
                F.col("dst_kind").alias("kind"),
                F.col("dst").alias("node"),
                contrib.alias("contrib"),
            )
            .groupBy("kind", "node")
            .agg(F.sum("contrib").alias("in_mass"))
            .select(
                "kind",
                "node",
                (
                    PR_BASE_MICRO + F.expr("(85 * in_mass) DIV 100")
                ).cast("long").alias("rank_micro"),
            )
        )

    r2 = power_step(power_step(None))
    return (
        r2.filter(F.col("kind") == "s")
        .join(
            deg.filter(F.col("src_kind") == "s").select(
                F.col("src").alias("node"), F.col("outdeg").alias("n_links")
            ),
            "node",
        )
        .select(
            F.col("node").alias("l_suppkey"),
            "rank_micro",
            "n_links",
        )
    )


@register(
    "g2_triangle_count",
    oracle="""
        WITH e0 AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        thr AS (
            SELECT CAST(COUNT(DISTINCT c) // 8 AS BIGINT) AS min_shared
            FROM e0
        ),
        edges AS (
            SELECT a.s AS u, b.s AS v
            FROM e0 a JOIN e0 b ON a.c = b.c AND a.s < b.s
            GROUP BY a.s, b.s
            HAVING COUNT(*) >= (SELECT min_shared FROM thr)
        ),
        tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.v
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        pernode AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
                SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            ) GROUP BY node
        )
        SELECT node AS l_suppkey, n_triangles FROM pernode
    """,
    doc="Triangle counting (clustering structure) over the supplier "
    "co-purchase graph: suppliers are adjacent when they share at "
    "least n_customers/8 common customers (the threshold scales with "
    "the fixture so the graph is neither empty nor complete at any "
    "SF), and each node's triangle participation count measures how "
    "clique-ish its neighborhood is — the standard motif signal for "
    "community detection and recommendation. The plan is the "
    "canonical distributed algorithm: canonical edge orientation "
    "(u < v) makes each triangle countable exactly once, two "
    "equi-joins enumerate wedges and close them, per-node counts "
    "aggregate partial+final. At 100 TB orient by DEGREE instead of "
    "id (the standard skew fix) — same plan, different ordering key. "
    "Third member of the graph family (dd6 CC, g1 PageRank).",
    tags=("graph", "motif", "centrality"),
)
def g2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table_parallel(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    e0 = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # scale-adaptive sparsification threshold (one scalar, broadcast)
    min_shared = e0.select(
        (F.countDistinct("c") / 8).cast("long").alias("min_shared")
    )
    edges = (
        e0.alias("a")
        .join(
            e0.alias("b"),
            (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count("*").alias("shared"))
        .join(F.broadcast(min_shared))
        .filter(F.col("shared") >= F.col("min_shared"))
        .select("u", "v")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy(F.col("node").alias("l_suppkey")).agg(
        F.count("*").alias("n_triangles")
    )
