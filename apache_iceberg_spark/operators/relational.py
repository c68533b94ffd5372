"""Reference-parity relational surface (SURVEY.md §2.2-§2.6).

Every query the reference's notebooks execute, re-expressed as a lazy
DataFrame composition over the driver's TPC-H-ish testdata (`customer` plays
the role of the reference's `users` table — FIXTURES.md §5). Reference
citations point at /root/reference.

Scale notes: these are all single-pass scans, hash aggregations, or joins
whose physical strategy Catalyst/AQE picks. Small dimension tables (nation,
region, supplier) are explicitly broadcast so the join never shuffles the
fact side.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_spark.registry import register
from apache_iceberg_spark.tables import load_table

# ---------------------------------------------------------------------------
# §2.2 Projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "p1_projection",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    doc="P1 column projection (query_iceberg.ipynb:683-685). Pruned scan: "
    "only 3 of 5 columns read from parquet.",
    tags=("parity", "projection"),
)
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "p2_star",
    oracle="SELECT * FROM orders",
    doc="P2 star projection (query_iceberg.ipynb:1389).",
    tags=("parity", "projection"),
)
def p2_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select("*")


@register(
    "p3_literal_agg",
    oracle=(
        "SELECT 'BUILDING' AS segment, COUNT(*) AS cnt "
        "FROM customer WHERE c_mktsegment = 'BUILDING'"
    ),
    doc="P3 literal projection + aliased aggregate (query_iceberg.ipynb:914).",
    tags=("parity", "projection", "aggregate"),
)
def p3_literal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("BUILDING").alias("segment"), "cnt")
    )


@register(
    "p4_bool_filter",
    oracle=(
        "SELECT c_custkey, c_acctbal > 5000.0 AS is_high "
        "FROM customer WHERE (c_acctbal > 5000.0) = true"
    ),
    doc="P4 boolean-equality filter (query_iceberg.ipynb:914 WHERE "
    "likesports = true), on a computed boolean since testdata has no "
    "boolean column.",
    tags=("parity", "filter"),
)
def p4_bool_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    is_high = F.col("c_acctbal") > 5000.0
    return c.filter(is_high == True).select(  # noqa: E712  (reference shape: `= true`)
        "c_custkey", is_high.alias("is_high")
    )


@register(
    "p5_conj_filter",
    oracle=(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 0.0"
    ),
    doc="P5 conjunctive AND filter (query_iceberg.ipynb:1096).",
    tags=("parity", "filter"),
)
def p5_conj_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") > 0.0)
    ).select("c_custkey", "c_name")


@register(
    "p6_str_filter",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'MACHINERY'",
    doc="P6 string-equality filter (query_iceberg.ipynb:1335 WHERE state='WA').",
    tags=("parity", "filter"),
)
def p6_str_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "p7_pushdown_filter",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1998-01-01' "
        "AND o_orderdate < TIMESTAMP '1999-01-01'"
    ),
    doc="P7 scan-level predicate (blog part-2:279-282 row_filter). The range "
    "predicate reaches the parquet scan as PushedFilters → row-group "
    "pruning; at 100 TB with a date-partitioned table this becomes "
    "partition pruning.",
    tags=("parity", "filter", "pushdown"),
)
def p7_pushdown_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@register(
    "j1_inner_join",
    oracle=(
        "SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    ),
    doc="J1 inner equi-join with aliases (blog part-3:338-343). customer is "
    "the small side → AQE converts to broadcast-hash automatically; at "
    "100 TB with a large customer table this becomes sort-merge on the "
    "shuffled key.",
    tags=("parity", "join"),
)
def j1_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").alias("o")
    c = load_table(spark, sf_dir, "customer").alias("c")
    return o.join(c, F.col("o.o_custkey") == F.col("c.c_custkey"), "inner").select(
        "o.o_orderkey", "o.o_totalprice", "c.c_custkey", "c.c_name"
    )


@register(
    "j2_left_join",
    oracle=(
        "SELECT c.c_custkey, c.c_name, o.o_orderkey "
        "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey"
    ),
    doc="Left outer join (free parity headroom, SURVEY.md §2.3).",
    tags=("join",),
)
def j2_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").alias("o")
    c = load_table(spark, sf_dir, "customer").alias("c")
    return c.join(o, F.col("o.o_custkey") == F.col("c.c_custkey"), "left").select(
        "c.c_custkey", "c.c_name", "o.o_orderkey"
    )


@register(
    "j3_semi_join",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 300000.0)"
    ),
    doc="Left-semi join: customers having a big order.",
    tags=("join",),
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    c = load_table(spark, sf_dir, "customer")
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "j4_anti_join",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
    doc="Left-anti join: customers with no orders.",
    tags=("join",),
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "j5_broadcast_dim_join",
    oracle=(
        "SELECT c.c_custkey, n.n_name AS nation, r.r_name AS region "
        "FROM customer c "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey"
    ),
    doc="Star-schema dim join with explicit broadcast of nation/region "
    "(25 / 5 rows at any SF): zero shuffle of the fact side — the plan "
    "every 100 TB star join should have.",
    tags=("join", "broadcast"),
)
def j5_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").alias("c")
    n = F.broadcast(load_table(spark, sf_dir, "nation")).alias("n")
    r = F.broadcast(load_table(spark, sf_dir, "region")).alias("r")
    return (
        c.join(n, F.col("c.c_nationkey") == F.col("n.n_nationkey"))
        .join(r, F.col("n.n_regionkey") == F.col("r.r_regionkey"))
        .select(
            "c.c_custkey",
            F.col("n.n_name").alias("nation"),
            F.col("r.r_name").alias("region"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@register(
    "a1_count_star",
    oracle="SELECT COUNT(*) AS total_users FROM customer",
    doc="A1 ungrouped COUNT(*) (query_iceberg.ipynb:368; result 49,990 in "
    "the reference).",
    tags=("parity", "aggregate"),
)
def a1_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").agg(
        F.count("*").alias("total_users")
    )


@register(
    "a2_groupby_count",
    oracle=(
        "SELECT c_mktsegment AS segment, COUNT(*) AS user_count "
        "FROM customer GROUP BY c_mktsegment"
    ),
    doc="A2 GROUP BY + COUNT hash aggregation (query_iceberg.ipynb:798-800). "
    "Partial (map-side) + final agg — one shuffle of 5 groups, not rows.",
    tags=("parity", "aggregate"),
)
def a2_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("user_count"))
    )


@register(
    "a3_union_fanout",
    oracle=(
        "SELECT 'click' AS label, COUNT(*) AS cnt FROM events WHERE event_type = 'click' "
        "UNION ALL SELECT 'view', COUNT(*) FROM events WHERE event_type = 'view' "
        "UNION ALL SELECT 'purchase', COUNT(*) FROM events WHERE event_type = 'purchase' "
        "UNION ALL SELECT 'signup', COUNT(*) FROM events WHERE event_type = 'signup' "
        "UNION ALL SELECT 'error', COUNT(*) FROM events WHERE event_type = 'error'"
    ),
    doc="A3 filtered-count fan-out glued with UNION ALL "
    "(query_iceberg.ipynb:914-933, 10 branches there, 5 event types here). "
    "Kept branch-shaped for parity; a4_pivot_counts is the one-pass "
    "idiomatic rewrite.",
    tags=("parity", "aggregate", "union"),
)
def a3_union_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    branches = [
        e.filter(F.col("event_type") == t).agg(
            F.count("*").alias("cnt")
        ).select(F.lit(t).alias("label"), "cnt")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return reduce(DataFrame.unionAll, branches)


@register(
    "a4_pivot_counts",
    oracle=(
        "SELECT "
        "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_cnt, "
        "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_cnt, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_cnt "
        "FROM events"
    ),
    doc="One-pass conditional-count rewrite of A3 (SURVEY.md §2.4 note): a "
    "single scan instead of N — the shape that survives 100× scale-up.",
    tags=("aggregate",),
)
def a4_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        *[
            F.sum(
                F.when(F.col("event_type") == t, 1).otherwise(0)
            ).alias(f"{t}_cnt")
            for t in ("click", "view", "purchase")
        ]
    )


@register(
    "a5_distinct_count",
    oracle=(
        "SELECT COUNT(DISTINCT o_custkey) AS n_customers, "
        "COUNT(DISTINCT o_orderpriority) AS n_priorities FROM orders"
    ),
    doc="DISTINCT aggregates (headroom, SURVEY.md §2.4).",
    tags=("aggregate",),
)
def a5_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@register(
    "a6_rollup",
    oracle=(
        "SELECT n_name AS nation, c_mktsegment AS segment, COUNT(*) AS cnt "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY ROLLUP (n_name, c_mktsegment)"
    ),
    doc="ROLLUP hierarchy aggregation (headroom).",
    tags=("aggregate",),
)
def a6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .rollup(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# §2.5 Sorts / limits / top-k
# ---------------------------------------------------------------------------


@register(
    "o1_orderby_desc",
    oracle=(
        "SELECT c_mktsegment AS segment, COUNT(*) AS user_count FROM customer "
        "GROUP BY c_mktsegment ORDER BY user_count DESC, segment"
    ),
    doc="O1 ORDER BY … DESC over a grouped count (query_iceberg.ipynb:801); "
    "segment tiebreak keeps the order total.",
    tags=("parity", "sort"),
)
def o1_orderby_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("user_count"))
        .orderBy(F.desc("user_count"), F.asc("segment"))
    )


@register(
    "o2_limit",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10",
    doc="O2 LIMIT (query_iceberg.ipynb:685). Ordered by the unique key so the "
    "surviving rows are well-defined (the reference's bare LIMIT has "
    "engine-dependent row choice).",
    tags=("parity", "limit"),
)
def o2_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(10)
    )


@register(
    "o3_topk",
    oracle=(
        "SELECT c_nationkey AS nationkey, COUNT(*) AS user_count FROM customer "
        "GROUP BY c_nationkey ORDER BY user_count DESC, nationkey LIMIT 10"
    ),
    doc="O3 top-k: GROUP BY + ORDER BY count DESC + LIMIT "
    "(query_iceberg.ipynb:800-802, the flagship 'states histogram'). "
    "Catalyst compiles the sort+limit to TakeOrderedAndProject — no full "
    "sort at any scale.",
    tags=("parity", "topk", "flagship"),
)
def o3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("user_count"))
        .orderBy(F.desc("user_count"), F.asc("nationkey"))
        .limit(10)
    )




@register(
    "o4_offset_pagination",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
    """,
    doc="Offset pagination (page 3 of a price-ranked listing): total order "
    "on (price, unique key) then offset+limit. Spark compiles "
    "offset+limit into a single CollectLimit with skip — fine for "
    "UI-page offsets; for deep pagination at scale use keyset "
    "pagination instead (WHERE (price, key) < last_seen ORDER BY ... "
    "LIMIT n), which stays index/pushdown-friendly.",
    tags=("sort", "limit", "pagination"),
)
def o4_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(40)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# §2.6 Set operations
# ---------------------------------------------------------------------------


@register(
    "u1_union_all",
    oracle=(
        "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING' "
        "UNION ALL "
        "SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0"
    ),
    doc="U1 n-ary UNION ALL (query_iceberg.ipynb:915-932); overlapping "
    "branches keep duplicates, proving ALL semantics.",
    tags=("parity", "union"),
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = c.filter(F.col("c_acctbal") > 9000.0).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.unionAll(b)


@register(
    "u2_intersect",
    oracle=(
        "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING' "
        "INTERSECT "
        "SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0"
    ),
    doc="INTERSECT (headroom, SURVEY.md §2.6).",
    tags=("setop",),
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = c.filter(F.col("c_acctbal") > 1000.0).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.intersect(b)


@register(
    "u3_except",
    oracle=(
        "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING' "
        "EXCEPT "
        "SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0"
    ),
    doc="EXCEPT (headroom).",
    tags=("setop",),
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = c.filter(F.col("c_acctbal") > 1000.0).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.subtract(b)  # EXCEPT = distinct set difference


@register(
    "o6_keyset_pagination",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice <= 50000.0
          AND (o_totalprice < 50000.0 OR o_orderkey > 123)
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    doc="Keyset (cursor) pagination — the scale-correct companion of "
    "o4's offset form: the client passes the last row it saw as a "
    "(price, key) cursor and the next page is a pure filter + top-k. "
    "Unlike OFFSET (which must produce and discard every earlier row — "
    "O(page_depth) per request), the cursor predicate is written "
    "pushdown-friendly (a sargable price bound AND'd with the "
    "tie-breaker) so it reaches the parquet reader and page 10,000 "
    "costs the same as page 1; the top-k is a TakeOrderedAndProject, "
    "never a global sort.",
    tags=("sort", "limit", "pagination"),
)
def o6_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    cursor_price, cursor_key = 50000.0, 123
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .filter(
            (F.col("o_totalprice") <= cursor_price)
            & (
                (F.col("o_totalprice") < cursor_price)
                | (F.col("o_orderkey") > cursor_key)
            )
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "u6_bag_set_ops",
    oracle="""
        WITH a AS (
            SELECT l_suppkey FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1996-04-01'
        ),
        b AS (
            SELECT l_suppkey FROM lineitem
            WHERE l_shipdate >= DATE '1996-04-01'
              AND l_shipdate < DATE '1996-07-01'
        )
        SELECT 'except' AS op, l_suppkey FROM (
            SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b)
        UNION ALL
        SELECT 'intersect' AS op, l_suppkey FROM (
            SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b)
    """,
    doc="Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL) — the "
    "multiplicity-preserving duals of u2/u3's set forms: supplier "
    "activity in Q1-1996 minus / intersected with Q2-1996, where a "
    "supplier shipping 5 vs 2 lineitems contributes 3 and 2 copies "
    "respectively. Spark plans both as a single count-aggregating "
    "shuffle per operator (generate min/diff of per-key counts), not a "
    "join per duplicate — the multiplicities never materialize until "
    "the final replicate.",
    tags=("setop",),
)
def u6_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    a = l.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    ).select("l_suppkey")
    b = l.filter(
        (F.col("l_shipdate") >= "1996-04-01") & (F.col("l_shipdate") < "1996-07-01")
    ).select("l_suppkey")
    ex = a.exceptAll(b).select(F.lit("except").alias("op"), "l_suppkey")
    ix = a.intersectAll(b).select(F.lit("intersect").alias("op"), "l_suppkey")
    return ex.unionByName(ix)


@register(
    "p8_inlist_disjunction_filter",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_orderpriority
        FROM orders
        WHERE o_orderstatus IN ('F', 'P')
          AND (o_orderpriority = '1-URGENT'
               OR o_orderpriority = '2-HIGH')
    """,
    doc="IN-list + disjunctive predicate: the membership filter compiles "
    "to a single In() pushed to the parquet reader (row groups whose "
    "status min/max excludes both values never decompress) and the OR "
    "of equalities likewise pushes as Or(EqualTo, EqualTo) — asserted "
    "in tests/test_plans.py. Completes the predicate family (p4-p7 "
    "cover boolean/conjunctive/string/comparison pushdown).",
    tags=("filter", "pushdown"),
)
def p8_inlist_disjunction_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & (
            (F.col("o_orderpriority") == "1-URGENT")
            | (F.col("o_orderpriority") == "2-HIGH")
        )
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")
