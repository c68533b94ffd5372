"""Property-based tests (SURVEY.md §5: hypothesis over the pure kernels,
few-example property checks over the Spark utilities).

Pure-Python kernels get wide random coverage; Spark-backed properties run
a handful of examples each (session startup dominates, and the properties
are partition-count/row-content invariants, not numeric fuzz).
"""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# pure kernels: wide random coverage
# ---------------------------------------------------------------------------


@given(st.integers(min_value=0, max_value=10**13), st.integers(1, 4096))
def test_iteration_partitions_bounds(n_nodes, parallelism):
    from apache_iceberg_spark.operators.dedup import (
        _CC_NODES_PER_PARTITION,
        iteration_partitions,
    )

    p = iteration_partitions(n_nodes, parallelism)
    assert 1 <= p <= parallelism
    # monotone in graph size
    assert p <= iteration_partitions(n_nodes * 2 + 1, parallelism)
    # never more than one partition per chunk of nodes
    if n_nodes > 0:
        assert p <= -(-n_nodes // _CC_NODES_PER_PARTITION) or p == 1


@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=60,
    )
)
def test_resolve_table_name_invariants(filename):
    from apache_iceberg_spark.ingest.naming import resolve_table_name

    name = resolve_table_name(filename + ".csv", pluralize=False)
    # output charset is the sqlite/iceberg-safe identifier set
    assert all(c.islower() or c.isdigit() or c == "_" for c in name)
    assert not name.startswith("_") and not name.endswith("_")
    assert "__" not in name
    # idempotent: resolving a resolved name changes nothing (an empty
    # resolution would re-resolve as a dotfile — splitext semantics —
    # so the property only applies to non-empty names)
    if name:
        assert resolve_table_name(name + ".csv", pluralize=False) == name


@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
def test_zorder_code_python_model(x, y):
    """The Morton interleave must equal the bit-twiddling model: bit k of
    x at position 2k, bit k of y at 2k+1 (checked via the same polynomial
    in Python; the Spark expression is tested in the m8 oracle gate)."""

    def morton(a: int, b: int, bits: int = 16) -> int:
        out = 0
        for k in range(bits):
            out |= ((a >> k) & 1) << (2 * k)
            out |= ((b >> k) & 1) << (2 * k + 1)
        return out

    z = morton(x, y)
    # de-interleave restores both coordinates — the code is injective
    xx = sum(((z >> (2 * k)) & 1) << k for k in range(16))
    yy = sum(((z >> (2 * k + 1)) & 1) << k for k in range(16))
    assert (xx, yy) == (x, y)


# ---------------------------------------------------------------------------
# Spark-backed properties: few examples, structural invariants
# ---------------------------------------------------------------------------

_spark_examples = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 100)),
        min_size=1,
        max_size=30,
    ),
    n_salts=st.integers(2, 8),
)
@_spark_examples
def test_salted_join_equals_plain_join(spark, rows, n_salts):
    from apache_iceberg_spark.operators.scale import salted_join

    left = spark.createDataFrame(rows, "k int, v int")
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(0, 10, 2)], "k int, w int"
    )
    plain = sorted(
        tuple(r) for r in left.join(right, "k").select("k", "v", "w").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(left, right, "k", n_salts=n_salts)
        .select("k", "v", "w")
        .collect()
    )
    assert salted == plain


@given(
    updates_keys=st.lists(st.integers(1, 20), min_size=0, max_size=10),
)
@_spark_examples
def test_upsert_idempotent_and_unique(spark, updates_keys):
    from apache_iceberg_spark.operators.scale import upsert

    current = spark.createDataFrame(
        [(k, "old") for k in range(1, 11)], "k int, v string"
    )
    updates = spark.createDataFrame(
        [(k, "new") for k in set(updates_keys)], "k int, v string"
    )
    once = upsert(current, updates, "k")
    twice = upsert(once, updates, "k")
    got_once = sorted(tuple(r) for r in once.collect())
    got_twice = sorted(tuple(r) for r in twice.collect())
    assert got_once == got_twice  # applying the same batch again is a no-op
    keys = [r.k for r in once.select("k").collect()]
    assert len(keys) == len(set(keys))  # key uniqueness preserved
    for k in set(updates_keys):
        assert (k, "new") in got_once


@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=900,
    )
)
@example(text="")
@_spark_examples
def test_chunking_covers_text_exactly(spark, text):
    """tx9's chunks must tile the document: starts at 1, 1+stride, …;
    each chunk is the exact substring; stitching the stride-prefixes plus
    the final chunk reconstructs the document byte-for-byte. An empty
    document yields zero chunks (not a sequence-bounds error), matching
    the oracle's generate_series(1, 0)."""
    from apache_iceberg_spark.operators.pipeline import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )
    from apache_iceberg_spark.registry import REGISTRY

    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile
    import os

    d = tempfile.mkdtemp(prefix="chunk_prop_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array([text], pa.string()),
                "lang": pa.array(["en"], pa.string()),
                "source": pa.array(["t"], pa.string()),
                "n_chars": pa.array([len(text)], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    rows = sorted(
        (r.chunk_start, r.chunk_text)
        for r in REGISTRY["tx9_chunking"].spark(spark, d).collect()
    )
    starts = [s for s, _ in rows]
    assert starts == list(range(1, len(text) + 1, CHUNK_STRIDE))
    if not text:
        assert rows == []
        return
    for s, chunk in rows:
        assert chunk == text[s - 1 : s - 1 + CHUNK_SIZE]
    stitched = "".join(c[:CHUNK_STRIDE] for _, c in rows[:-1]) + rows[-1][1]
    assert stitched == text
