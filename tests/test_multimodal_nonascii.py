"""mm2's oracle must be byte-true, not code-point-true (VERDICT r1 item 4).

``ascii(c)`` sums Unicode code points; the Spark decoder sums UTF-8 bytes.
Those agree only on pure-ASCII payloads. This test runs the full
Spark-vs-DuckDB differential on a fixture that is deliberately multibyte
(accented Latin, CJK, emoji) so any code-point/byte divergence fails.
"""

from __future__ import annotations

import pytest

from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

_DOCS = [
    (1, "héllo wörld — naïve café", "fr", "web", 24),
    (2, "中文文档：大规模数据处理", "zh", "web", 12),
    (3, "emoji payload 🚀🔥 done", "en", "web", 21),
    (4, "plain ascii only", "en", "web", 16),
    (5, "mixed: Ωμέγα κλπ", "el", "web", 16),
]


@pytest.fixture(scope="module")
def nonascii_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nonascii_sf")
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in _DOCS], pa.int64()),
            "text": pa.array([r[1] for r in _DOCS], pa.string()),
            "lang": pa.array([r[2] for r in _DOCS], pa.string()),
            "source": pa.array([r[3] for r in _DOCS], pa.string()),
            "n_chars": pa.array([r[4] for r in _DOCS], pa.int64()),
        }
    )
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def test_mm2_byte_true_on_multibyte(spark, nonascii_dir):
    import duckdb

    q = REGISTRY["mm2_decode_features"]
    srows = {
        r["doc_id"]: (r["n_bytes"], r["byte_sum"], r["mean_intensity"])
        for r in q.spark(spark, nonascii_dir).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{nonascii_dir}/documents.parquet'"
    )
    drows = {r[0]: (r[1], r[2], r[3]) for r in con.execute(q.oracle).fetchall()}
    con.close()

    # python ground truth: UTF-8 byte statistics
    truth = {
        doc_id: (len(t.encode()), sum(t.encode()))
        for doc_id, t, *_ in _DOCS
    }
    assert set(srows) == set(drows) == set(truth)
    for doc_id, (n_bytes, byte_sum) in truth.items():
        assert srows[doc_id][0] == n_bytes, f"spark n_bytes doc {doc_id}"
        assert srows[doc_id][1] == byte_sum, f"spark byte_sum doc {doc_id}"
        assert drows[doc_id][0] == n_bytes, f"oracle n_bytes doc {doc_id}"
        assert drows[doc_id][1] == byte_sum, f"oracle byte_sum doc {doc_id}"
        assert srows[doc_id][2] == drows[doc_id][2], f"mean doc {doc_id}"
