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
    # Both directions via one explode (a 2-branch union would recompute
    # the distinct-pairs join per branch), and persist: the edge frame
    # feeds deg, both unrolled power steps, and the final projection —
    # four consumers of one fact-join lineage. At cluster scale this is
    # the materialized, src-bucketed edge table the loop reads.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("c").alias("src_kind"),
                    F.col("c").alias("src"),
                    F.lit("s").alias("dst_kind"),
                    F.col("s").alias("dst"),
                ),
                F.struct(
                    F.lit("s").alias("src_kind"),
                    F.col("s").alias("src"),
                    F.lit("c").alias("dst_kind"),
                    F.col("c").alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src_kind", "e.src", "e.dst_kind", "e.dst").persist()
    deg = (
        edges.groupBy("src_kind", "src")
        .agg(F.count("*").alias("outdeg"))
        .persist()
    )

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


G2_KNN = 8   # strongest co-purchase neighbors kept per supplier
G2_CAP = 24  # suppliers counted per customer (interaction cap)


@register(
    "g2_triangle_count",
    oracle=f"""
        WITH e0 AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        capped AS (
            SELECT c, unnest(ss) AS s FROM (
                SELECT c, list_sort(list(s))[1:{G2_CAP}] AS ss
                FROM e0 GROUP BY c)
        ),
        p AS (
            SELECT a.s AS u, b.s AS v, COUNT(*) AS shared
            FROM capped a JOIN capped b ON a.c = b.c AND a.s < b.s
            GROUP BY a.s, b.s
        ),
        dirs AS (
            SELECT u, v, shared FROM p
            UNION ALL SELECT v, u, shared FROM p
        ),
        knn AS (
            SELECT u, v FROM (
                SELECT u, v, ROW_NUMBER() OVER (
                    PARTITION BY u ORDER BY shared DESC, v
                ) AS rk FROM dirs
            ) WHERE rk <= {G2_KNN}
        ),
        edges AS (
            SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v FROM knn
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
    doc=f"Triangle counting (clustering structure) over the top-"
    f"{G2_KNN} co-purchase similarity graph: each supplier keeps its "
    f"{G2_KNN} strongest neighbors by shared-customer count "
    "(deterministic tiebreak), which bounds every node's degree at "
    f"ANY density, and each customer contributes at most {G2_CAP} "
    "suppliers to the co-occurrence counts (the interaction cap that "
    "bounds the per-key explode under power-law customers) "
    "ANY corpus density — the standard kNN-graph sparsification that "
    "keeps motif counting tractable where a global threshold either "
    "empties or completes the graph as density shifts. Pair weights "
    "come from an in-bucket ordered-pair explode per customer (dd2's "
    "trick — one shuffle on customer, one on the pair key, never a "
    "row-level self-join); canonical orientation (u < v) counts each "
    "triangle once via two wedge-closing equi-joins; per-node counts "
    "aggregate partial+final. Third member of the graph family "
    "(dd6 CC, g1 PageRank).",
    tags=("graph", "motif", "centrality"),
)
def g2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = load_table_parallel(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    e0 = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # per-customer supplier sets -> in-bucket ordered pair explode
    # (one shuffle on customer; the self-join formulation shuffles the
    # same rows twice and joins row-level)
    per_cust = e0.groupBy("c").agg(
        F.slice(F.sort_array(F.collect_list("s")), 1, G2_CAP).alias("ss")
    )
    pairs = (
        per_cust.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("pr")
        )
        .groupBy(F.col("pr.u").alias("u"), F.col("pr.v").alias("v"))
        .agg(F.count("*").alias("shared"))
    )
    # Both directions via one explode — referencing `pairs` twice would
    # recompute the whole upstream co-occurrence aggregation per branch.
    dirs = pairs.select(
        F.explode(
            F.array(
                F.struct("u", "v", "shared"),
                F.struct(
                    F.col("v").alias("u"), F.col("u").alias("v"), "shared"
                ),
            )
        ).alias("d")
    ).select("d.u", "d.v", "d.shared")
    w = Window.partitionBy("u").orderBy(F.desc("shared"), F.asc("v"))
    knn = (
        dirs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= G2_KNN)
        .select("u", "v")
    )
    # The sparsified edge list (≤ G2_KNN * n_nodes rows) feeds three join
    # inputs; persist it so the full kNN pipeline above runs once, not
    # three times (at cluster scale: a checkpoint table, same idea).
    edges = (
        knn.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .persist()
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
    # One pass over tri (explode), not a 3-branch union recomputing it.
    nodes = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return nodes.groupBy(F.col("node").alias("l_suppkey")).agg(
        F.count("*").alias("n_triangles")
    )
