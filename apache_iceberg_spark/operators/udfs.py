"""User-defined function taxonomy (SURVEY.md §2.9).

The reference has no UDFs — its extensibility is host-language Python
around the engine. This module demonstrates every Spark extension point a
production pipeline actually uses, each under the same DuckDB oracle gate
as the built-in operators:

- **pandas UDAF** (grouped aggregate, Arrow-batched): f9 — a custom
  aggregator receiving each group as a pandas Series.
- **Python UDTF** (table function, lateral-joined): f10 — one input row
  expanding to N output rows.
- (mapInPandas and applyInPandasWithState — the other two extension
  points — are exercised by mm2/ann4 and st5 respectively.)

Scale notes: a grouped-agg pandas UDF shuffles once on the group key and
streams each group through Arrow — same plan shape as a built-in agg but
WITHOUT map-side partial aggregation, which is precisely why the
docstrings below say "prefer built-ins when one exists": at 100 TB a
built-in percentile_approx beats this exact-median UDAF on skewed groups.
A UDTF is a generator per input row (map-only, no shuffle).
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from apache_iceberg_spark.registry import register
from apache_iceberg_spark.tables import load_table


def _grouped_agg_udfs():
    # Built lazily: decorating at import time would require an active
    # SparkContext before any session exists. Both aggregates are pandas
    # UDAFs because Spark cannot mix a group-agg pandas UDF with built-in
    # aggregate functions in one agg (INVALID_PANDAS_UDF_PLACEMENT).
    @pandas_udf("double")
    def _median_cents(v: pd.Series) -> float:
        # pandas linear-interpolated median over exact integer cents: the
        # midpoint average is exact in double, so DuckDB's median() (same
        # interpolation, same integers) matches bitwise.
        return float(v.median())

    @pandas_udf("long")
    def _count_rows(v: pd.Series) -> int:
        return len(v)

    return _median_cents, _count_rows


@register(
    "f9_pandas_udaf",
    oracle="""
        SELECT o_orderstatus,
               median(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   AS median_cents,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    doc="Custom grouped-aggregate pandas UDAFs (the Arrow-batched UDAF "
    "extension point): exact per-status median over integer cents plus "
    "a UDAF row count in one agg (Spark disallows mixing pandas and "
    "built-in aggregates). One shuffle on the group key; each group "
    "streams to Python as one Arrow batch. No map-side partials — the "
    "documented cost of custom UDAFs vs built-ins, and why "
    "a11/percentile_approx is the 100 TB choice when approximation is "
    "acceptable.",
    tags=("udf", "udaf", "pandas"),
)
def f9_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
    median_cents, count_rows = _grouped_agg_udfs()
    return (
        o.groupBy("o_orderstatus")
        .agg(
            median_cents(cents).alias("median_cents"),
            count_rows(cents).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


F10_HEAD_N = 5


@register(
    "f10_python_udtf",
    oracle=rf"""
        WITH t AS (
            SELECT doc_id,
                   string_split(trim(lower(regexp_replace(text,
                                '[ \t\n\r\f]+', ' ', 'g'))), ' ') AS toks
            FROM documents
        )
        SELECT doc_id, i AS idx, toks[i] AS word
        FROM t, UNNEST(generate_series(1, least(len(toks), {F10_HEAD_N})))
                AS u(i)
    """,
    doc=f"Python UDTF (table function) lateral-joined to the scan: each "
    f"document expands to its first {F10_HEAD_N} tokens as "
    "(idx, word) rows — the one-row-to-N-rows extension point "
    "(Spark 4 `@udtf`). Map-only: the generator runs per input "
    "partition, no shuffle. Whitespace runs are normalized to a single "
    "space by the ENGINE regex on both sides before the UDTF splits on "
    "the literal space, so Python never interprets a whitespace class — "
    "and the normalizer spells out [ \\t\\n\\r\\f] because the \\s "
    "shorthand itself differs across engines (Java includes \\v, RE2 "
    "does not).",
    tags=("udf", "udtf"),
)
def f10_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, word string")
    class HeadWords:
        def eval(self, text: str):
            if text is None:
                return
            # input arrives whitespace-normalized and space-trimmed; a
            # literal-space split matches both engines' semantics exactly
            # (including the single empty token an empty text produces)
            toks = text.split(" ")
            for i, w in enumerate(toks[:F10_HEAD_N], start=1):
                yield (i, w)

    spark.udtf.register("head_words", HeadWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_f10_documents"
    )
    return spark.sql(
        "SELECT doc_id, t.idx, t.word FROM _f10_documents, "
        "LATERAL head_words(trim(lower(regexp_replace(text, "
        "'[ \\\\t\\\\n\\\\r\\\\f]+', ' ')))) t"
    )
