"""TPC-H-style decision-support suite adapted to the testdata schema.

The reference's query surface is plain SQL analytics over tables
(`query_iceberg.ipynb:368-1491`); this module widens that surface to the
full classic decision-support shapes — correlated EXISTS, multi-way joins
with broadcast dims, HAVING-subquery semi-joins, disjunctive pushdown,
scalar subqueries, anti-joins — each expressed as an idiomatic Catalyst
plan and oracle-checked against DuckDB.

The testdata schema (TESTDATA.md) is a TPC-H subset: no `partsupp`, no
commit/receipt dates, no comments/phones. Queries that need those columns
are adapted (documented per query); Q2/Q11/Q16/Q20 (partsupp-centric) run
over a partsupp relation derived from lineitem's distinct
(l_partkey, l_suppkey) pairs — see `_derived_partsupp`.

Determinism (registry rules): money sums on exact integer cents, scaled
back by an identical final division; LIMIT always under a total ORDER BY
with a unique tiebreak.

Scale notes per query are in each docstring — the common shape is: filter
dims first, broadcast the filtered dim, shuffle the fact table at most
once, aggregate partially map-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_spark.registry import register
from apache_iceberg_spark.tables import load_table


def _cents(col: F.Column, scale: int = 100) -> F.Column:
    return F.round(col * scale).cast("long")


def _rev_cents() -> F.Column:
    """Discounted revenue on exact 1/100-cent integers (column objects need a
    live SparkContext, so this is built lazily per query)."""
    return _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)


_REV_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"


@register(
    "q4_priority_late_orders",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 adapted (no commitdate → 'shipped >30 days after order'): "
    "correlated EXISTS as a LEFT SEMI join on the order key with the "
    "non-equi date predicate inside the join condition — one shuffle on "
    "o_orderkey, then a tiny grouped count.",
    tags=("tpch", "join", "semi"),
)
def q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o["o_orderkey"] == l["l_orderkey"])
            & (l["l_shipdate"] > F.expr("o_orderdate + INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               YEAR(l_shipdate) AS l_year,
               CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    doc="TPC-H Q7: bilateral trade volume between two nations by ship year. "
    "nation broadcasts twice (supplier side / customer side); the "
    "nation-pair disjunction prunes after both joins. Fact shuffles on "
    "l_orderkey only for the orders join.",
    tags=("tpch", "join", "aggregate"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"),
                             F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(s.select("s_suppkey", "supp_nation")),
               F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "cust_nation"),
              F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(_rev_cents()).cast("double") / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                    AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
            SELECT YEAR(o_orderdate) AS o_year,
                   {_REV_SQL} AS volume,
                   n2.n_name AS nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'EUROPE'
              AND p.p_type = 'STANDARD'
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1997-12-31'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="TPC-H Q8: a nation's market share inside a region for one part "
    "type. All five dims broadcast (part filtered by type, nation×2, "
    "region, supplier); lineitem shuffles once on l_orderkey. The share "
    "is a ratio of two exact cent-sums cast to double.",
    tags=("tpch", "join", "aggregate"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust_nations = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"),
                             F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    vol = _rev_cents()
    joined = (
        l.join(F.broadcast(p.select("p_partkey")),
               F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "nation")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_nations),
              F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
        SELECT n.n_name AS nation,
               YEAR(o_orderdate) AS o_year,
               CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS profit
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 adapted (no ps_supplycost → discounted revenue as the "
    "profit proxy): revenue by supplier nation and order year for parts "
    "matching a name pattern. part/supplier/nation broadcast; lineitem "
    "shuffles once on l_orderkey.",
    tags=("tpch", "join", "aggregate"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    sn = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    return (
        l.join(F.broadcast(p.select("p_partkey")),
               F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(_rev_cents()).cast("double") / 10000.0).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue,
               c.c_acctbal, n.n_name, c.c_mktsegment
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10: top-20 customers by lost revenue on returned items in a "
    "quarter (two quarters here for row volume). Returnflag filter is "
    "pushed to the lineitem scan; customer⋈nation broadcasts; top-k via "
    "TakeOrderedAndProject with c_custkey tiebreak.",
    tags=("tpch", "join", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    cn = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        l.join(o.select("o_orderkey", "o_custkey"),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cn.select("c_custkey", "c_name", "c_acctbal", "n_name",
                        "c_mktsegment"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg((F.sum(_rev_cents()).cast("double") / 10000.0).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
                "c_mktsegment")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
        SELECT YEAR(l_shipdate) AS ship_year,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        GROUP BY ship_year
        ORDER BY ship_year
    """,
    doc="TPC-H Q12 adapted (no shipmode/receipt → late shipments by ship "
    "year): conditional counts split by order priority class. One "
    "shuffle on the join key; the CASE counts combine map-side.",
    tags=("tpch", "join", "aggregate"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
               (F.col("l_orderkey") == F.col("o_orderkey"))
               & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@register(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: order-count histogram over customers, including "
    "zero-order customers via the left outer join. Two shuffles: "
    "c_custkey (join+group), then the tiny c_count regroup.",
    tags=("tpch", "join", "aggregate"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
        SELECT CAST(100 * SUM(CASE WHEN p_type = 'PROMO'
                                   THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
               / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    doc="TPC-H Q14: promotional revenue share in a month. part broadcasts; "
    "date range is pushed to the lineitem scan; single scalar output — "
    "the ratio of two exact cent-sums.",
    tags=("tpch", "join", "aggregate"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev_cents()).otherwise(F.lit(0))
    return (
        l.join(F.broadcast(p.select("p_partkey", "p_type")),
               F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            ((F.sum(promo) * 100).cast("double")
             / F.sum(_rev_cents()).cast("double")).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM({_REV_SQL}) AS total_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(r.total_cents AS DOUBLE) / 10000.0 AS total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_cents = (SELECT MAX(total_cents) FROM revenue)
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15: supplier(s) with the maximum quarterly revenue. The "
    "revenue CTE aggregates once; the scalar MAX is a broadcast "
    "cross-join back onto it (no second scan of lineitem); comparison on "
    "exact cents so ties are exact.",
    tags=("tpch", "join", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_cents()).alias("total_cents")
    )
    max_rev = revenue.agg(F.max("total_cents").alias("max_cents"))
    return (
        revenue.join(F.broadcast(max_rev),
                     F.col("total_cents") == F.col("max_cents"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            (F.col("total_cents").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / 7.0 AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN (
            SELECT l_partkey AS a_pk, 0.2 * AVG(l_quantity) AS qty_limit
            FROM lineitem GROUP BY l_partkey
        ) a ON a.a_pk = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < qty_limit
    """,
    doc="TPC-H Q17: revenue from small-quantity orders relative to each "
    "part's average quantity. The correlated scalar subquery is decorrelated "
    "into a per-part aggregate joined back (broadcast — one row per part). "
    "AVG over integral doubles is exact, so the 0.2×avg threshold is "
    "bitwise identical across engines.",
    tags=("tpch", "join", "subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = l.groupBy(F.col("l_partkey").alias("a_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    return (
        l.join(F.broadcast(p.select("p_partkey")),
               F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("a_pk"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (F.sum(_cents(F.col("l_extendedprice"))).cast("double")
             / 100.0 / 7.0).alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 30000
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                 o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    doc="TPC-H Q18: customers with orders totaling >300 units. The HAVING "
    "subquery is a semi-join of orders against the per-order quantity "
    "aggregate (threshold on exact cents); customer broadcasts; top-100 "
    "via TakeOrderedAndProject with the unique o_orderkey tiebreak.",
    tags=("tpch", "join", "subquery", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    qty_c = _cents(F.col("l_quantity"))
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(qty_c).alias("tot_qty_cents"))
        .filter(F.col("tot_qty_cents") > 30000)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        l.join(big, F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg((F.sum(qty_c).cast("double") / 100.0).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_filters",
    oracle=f"""
        SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19: disjunctive brand/size/quantity predicates over a "
    "broadcast join. Catalyst extracts the common l_quantity bounds "
    "(1..30) as a pushable conjunct below the OR — the scan prunes "
    "before the join evaluates the full disjunction.",
    tags=("tpch", "join", "filter"),
)
def q19_disjunctive_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
               F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg((F.sum(_rev_cents()).cast("double") / 10000.0).alias("revenue"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    doc="TPC-H Q21 adapted (late := shipped >120 days after order date): "
    "suppliers solely responsible for late multi-supplier orders. The "
    "correlated EXISTS/NOT-EXISTS pair is decorrelated into one "
    "per-order aggregate (distinct suppliers vs distinct LATE suppliers) "
    "joined back — one extra shuffle instead of two correlated probes of "
    "the fact table.",
    tags=("tpch", "join", "subquery", "topk"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    # Lineitems of 'F' orders, flagged late relative to their order date.
    lo = l.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 120 DAYS")).cast(
            "int"
        ),
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    culprit_lines = (
        lo.filter(F.col("is_late") == 1)
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ),
            F.col("l_orderkey") == F.col("agg_orderkey"),
        )
    )
    return (
        culprit_lines.join(
            F.broadcast(s.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "q22_sales_opportunity",
    oracle="""
        SELECT c_nationkey AS cntry,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS totacctbal
        FROM customer c
        WHERE c_nationkey < 10
          AND CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
              SELECT CAST(AVG(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
              FROM customer
              WHERE c_acctbal > 0.0 AND c_nationkey < 10
          )
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY c_nationkey
        ORDER BY cntry
    """,
    doc="TPC-H Q22 adapted (no phone → nationkey as the country code; every "
    "synthetic customer has orders, so 'no orders' becomes 'dormant: no "
    "orders since 2000'): high-balance dormant customers per country. "
    "The scalar AVG subquery broadcasts as a 1-row cross join (on exact "
    "cents, so the threshold is deterministic); the NOT EXISTS is a LEFT "
    "ANTI join against the date-filtered orders.",
    tags=("tpch", "join", "subquery", "anti"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 10)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    bal_c = _cents(F.col("c_acctbal"))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg(bal_c).alias("avg_cents")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(bal_c > F.col("avg_cents"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(bal_c).cast("double") / 100.0).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the testdata has no partsupp table, so Q2/Q11/Q16/Q20
# are adapted over the part-supplier relationship implied by lineitem —
# distinct (l_partkey, l_suppkey) pairs with
#   ps_availqty  := SUM(int(l_quantity))          (total quantity moved)
#   ps_cost_cents := MIN(round(unit_price*100))   (best observed unit cost)
# The identical derivation runs on both engines: casts/rounds are per-row
# deterministic, MIN/SUM of bigint are order-insensitive.
# ---------------------------------------------------------------------------

_PS_CTE = """
        ps AS (
            SELECT l_partkey AS ps_partkey,
                   l_suppkey AS ps_suppkey,
                   SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty,
                   MIN(CAST(ROUND(l_extendedprice / l_quantity * 100) AS BIGINT))
                       AS ps_cost_cents
            FROM lineitem
            GROUP BY 1, 2
        )
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("ps_availqty"),
        F.min(
            _cents(F.col("l_extendedprice") / F.col("l_quantity"))
        ).alias("ps_cost_cents"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
        WITH {_PS_CTE},
        s_eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        costs AS (
            SELECT ps_partkey, ps_cost_cents, s_acctbal, s_name, n_name,
                   p_brand
            FROM ps
            JOIN s_eu ON ps_suppkey = s_suppkey
            JOIN part ON p_partkey = ps_partkey
            WHERE p_size = 15 AND p_type = 'LARGE'
        ),
        min_cost AS (
            SELECT ps_partkey, MIN(ps_cost_cents) AS min_cents
            FROM costs GROUP BY 1
        )
        SELECT c.s_acctbal, c.s_name, c.n_name, c.ps_partkey AS p_partkey,
               c.p_brand, c.ps_cost_cents / 100.0 AS supplycost
        FROM costs c
        JOIN min_cost m
          ON c.ps_partkey = m.ps_partkey AND c.ps_cost_cents = m.min_cents
        ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 adapted (partsupp derived from lineitem): minimum-cost "
    "European supplier per 15/LARGE part. Plan: dims (region→nation→"
    "supplier, filtered part) broadcast into the derived-partsupp agg; "
    "per-part minimum via a partial agg + self-equi-join on "
    "(part, min_cost) — both shuffles keyed on ps_partkey so AQE can "
    "reuse the exchange. Total ORDER BY with unique (s_name, partkey) "
    "tiebreak under the LIMIT.",
    tags=("tpch", "join", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s_eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        ps.join(F.broadcast(s_eu), ps["ps_suppkey"] == s_eu["s_suppkey"])
        .join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .select("ps_partkey", "ps_cost_cents", "s_acctbal", "s_name", "n_name", "p_brand")
    )
    min_cost = costs.groupBy("ps_partkey").agg(
        F.min("ps_cost_cents").alias("min_cents")
    )
    mc = min_cost.withColumnRenamed("ps_partkey", "mk")
    return (
        costs.join(
            mc,
            (costs["ps_partkey"] == mc["mk"])
            & (costs["ps_cost_cents"] == mc["min_cents"]),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand",
            (F.col("ps_cost_cents").cast("double") / 100.0).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle=f"""
        WITH {_PS_CTE},
        nat_ps AS (
            SELECT ps_partkey, ps_cost_cents * ps_availqty AS value_cents
            FROM ps
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_3', 'NATION_7')
        ),
        total AS (SELECT SUM(value_cents) AS total_cents FROM nat_ps)
        SELECT ps_partkey, SUM(value_cents) / 100.0 AS value
        FROM nat_ps, total
        GROUP BY ps_partkey, total_cents
        HAVING SUM(value_cents) > total_cents / 1000
        ORDER BY value DESC, ps_partkey
    """,
    doc="TPC-H Q11 adapted (derived partsupp; two-nation supplier group): "
    "per-part inventory value filtered to parts holding >0.1% of the "
    "group's total value. Plan: nation/supplier broadcast into the ps "
    "agg; the scalar total is a one-row broadcast join (no second scan "
    "of the fact); value sums on exact integer cents.",
    tags=("tpch", "subquery", "having"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    nat_ps = (
        ps.join(F.broadcast(s), ps["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            "ps_partkey",
            (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_cents"),
        )
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("sum_cents")
    )
    total = nat_ps.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("sum_cents") > F.col("total_cents") / 1000)
        .select(
            "ps_partkey",
            (F.col("sum_cents").cast("double") / 100.0).alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle=f"""
        WITH {_PS_CTE}
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        FROM ps
        JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
          AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 adapted (derived partsupp; 'complaints' → negative "
    "account balance): distinct supplier count per (brand, type, size). "
    "Plan: the NOT-IN becomes a broadcast LEFT ANTI join (safe: suppkey "
    "is non-null); filtered part dim broadcast; COUNT DISTINCT over the "
    "grouped pairs is a two-phase partial/final agg. Group key makes the "
    "ORDER BY total.",
    tags=("tpch", "distinct", "anti"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    bad_s = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad_s), ps["ps_suppkey"] == bad_s["s_suppkey"], "left_anti")
        .join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_promotion_suppliers",
    oracle=f"""
        WITH {_PS_CTE},
        recent AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(l_quantity AS BIGINT)) AS qty_recent
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1999-01-01'
              AND l_shipdate < TIMESTAMP '2000-01-01'
            GROUP BY 1, 2
        ),
        qualified AS (
            SELECT DISTINCT ps_suppkey
            FROM ps
            JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'small%'
            JOIN recent ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            WHERE ps_availqty > 4 * qty_recent
        )
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN qualified ON s_suppkey = ps_suppkey
        WHERE r_name = 'ASIA'
        ORDER BY s_name
    """,
    doc="TPC-H Q20 adapted (derived partsupp; availqty > 4× the 1999 "
    "shipped quantity for 'small%' parts; Asian suppliers). Plan: both "
    "aggregates key on (partkey, suppkey) so the qualifying join reuses "
    "one exchange; the supplier-side IN is a semi join against the small "
    "qualified set; region/nation broadcast. s_name is unique → total "
    "order.",
    tags=("tpch", "subquery", "semi"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    l = load_table(spark, sf_dir, "lineitem")
    recent = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_recent"))
    )
    qualified = (
        ps.join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .join(
            recent,
            (ps["ps_partkey"] == recent["l_partkey"])
            & (ps["ps_suppkey"] == recent["l_suppkey"]),
        )
        .filter(F.col("ps_availqty") > 4 * F.col("qty_recent"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(qualified, s["s_suppkey"] == qualified["ps_suppkey"], "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
