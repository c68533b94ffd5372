"""Loader parity tests (SURVEY.md §5 strategy #3, FIXTURES.md §3)."""

from __future__ import annotations

import os

import pytest

from apache_iceberg_spark.ingest import (
    detect_source_type,
    expand_glob_pattern,
    get_files_to_process,
    is_glob_pattern,
    is_remote_url,
    pluralize_word,
    resolve_table_name,
)
from apache_iceberg_spark.ingest.loader import (
    LoaderConfig,
    create_or_replace_table,
    csv_to_table_pipeline,
    read_csv,
)

# --- FIXTURES.md §3b: table-name resolution --------------------------------

NAMING_CASES = [
    ("Sales Data.csv", "sales_data", "sales_datas"),
    ("users.csv", "users", "userses"),
    ("my-file.v2.csv", "my_file_v2", "my_file_v2s"),
    ("CITY.csv", "city", "cities"),
    ("shelf.csv", "shelf", "shelves"),
    ("knife.csv", "knife", "knives"),
    ("__weird  name!!.csv", "weird_name", "weird_names"),
]


@pytest.mark.parametrize("filename,singular,plural", NAMING_CASES)
def test_resolve_table_name(filename, singular, plural):
    assert resolve_table_name(filename) == singular
    assert resolve_table_name(filename, pluralize=True) == plural


@pytest.mark.parametrize(
    "word,expected",
    [
        ("box", "boxes"),
        ("church", "churches"),
        ("wish", "wishes"),
        ("quiz", "quizes"),  # simple-rule engine: z → +es
        ("day", "days"),  # vowel + y → +s
        ("", ""),
    ],
)
def test_pluralize_word(word, expected):
    assert pluralize_word(word) == expected


# --- FIXTURES.md §3c: source dispatch --------------------------------------


def test_detect_source_type(tmp_path):
    f = tmp_path / "data.csv"
    f.write_text("a,b\n1,2\n")
    assert detect_source_type("https://x/y.csv") == "remote"
    assert detect_source_type("http://x/y.csv") == "remote"
    assert detect_source_type(str(tmp_path), "*.csv") == "glob"
    assert detect_source_type(str(f)) == "file"
    assert detect_source_type("data/*.csv") == "glob"
    assert detect_source_type("/no/such/path.csv") == "unknown"


def test_url_and_glob_predicates():
    assert is_remote_url("HTTPS://host/f.csv")
    assert not is_remote_url("/tmp/f.csv")
    assert is_glob_pattern("x/*.csv")
    assert is_glob_pattern("x/file[0-9].csv")
    assert not is_glob_pattern("x/plain.csv")


def test_expand_glob_sorted_files_only(tmp_path):
    (tmp_path / "b.csv").write_text("x\n1\n")
    (tmp_path / "a.csv").write_text("x\n1\n")
    (tmp_path / "sub.csv").mkdir()  # directory matching the pattern
    got = expand_glob_pattern(str(tmp_path), "*.csv")
    assert [os.path.basename(p) for p in got] == ["a.csv", "b.csv"]


def test_get_files_to_process_file_and_glob(tmp_path):
    f = tmp_path / "only.csv"
    f.write_text("x\n1\n")
    assert get_files_to_process(str(f)) == [(str(f), "only.csv")]
    pairs = get_files_to_process(str(tmp_path), "*.csv")
    assert pairs == [(str(f), "only.csv")]
    assert get_files_to_process("/no/such/path") == []


# --- FIXTURES.md §3a: CSV type-inference matrix + pipeline -----------------

TYPE_MATRIX_CSV = """s,i,f,ts,d,b,weird
hello,1,1.5,2024-01-01T00:00:00,2024-01-02,true,"{""k"": 1}"
"multi
line",2,2.5,2024-02-01T12:30:00,2024-02-03,false,
,,,,,,
"""


def test_read_csv_type_surface(spark, tmp_path):
    p = tmp_path / "matrix.csv"
    p.write_text(TYPE_MATRIX_CSV)
    df = read_csv(spark, str(p))
    dtypes = dict(df.dtypes)
    assert dtypes["s"] == "string"
    assert dtypes["i"] in ("int", "bigint")
    assert dtypes["f"] == "double"
    assert dtypes["ts"].startswith("timestamp")
    assert dtypes["d"] == "date"
    assert dtypes["b"] == "boolean"
    assert dtypes["weird"] == "string"  # fallback surface
    rows = df.collect()
    multiline_row = [r for r in rows if r["i"] == 2][0]
    assert multiline_row["s"] == "multi\nline"  # embedded newline preserved
    assert df.count() == 3
    # nulls survive in every column
    null_row = [r for r in rows if r["i"] is None][0]
    assert all(null_row[c] is None for c in df.columns)


def test_create_or_replace_and_pipeline(spark, tmp_path):
    p = tmp_path / "My Users.csv"
    p.write_text("id,name\n1,ann\n2,bo\n")
    cfg = LoaderConfig(source_path=str(p), namespace="ing_test")
    summary = csv_to_table_pipeline(spark, cfg)
    assert summary["exit_code"] == 0, summary
    assert summary["results"][0]["table"] == "ing_test.my_users"
    assert spark.table("ing_test.my_users").count() == 2
    # create-or-replace: loading again replaces, not appends
    summary2 = csv_to_table_pipeline(spark, cfg)
    assert summary2["exit_code"] == 0
    assert spark.table("ing_test.my_users").count() == 2


def test_glob_merge_table(spark, tmp_path):
    (tmp_path / "part1.csv").write_text("id,v\n1,a\n")
    (tmp_path / "part2.csv").write_text("v,id\nb,2\n")  # shuffled column order
    cfg = LoaderConfig(
        source_path=str(tmp_path),
        glob_pattern="*.csv",
        glob_merge_table=True,
        table_name="merged",
        namespace="ing_test",
    )
    summary = csv_to_table_pipeline(spark, cfg)
    assert summary["exit_code"] == 0, summary
    got = {
        (r["id"], r["v"]) for r in spark.table("ing_test.merged").collect()
    }
    assert got == {(1, "a"), (2, "b")}


def test_pipeline_env_config(spark, tmp_path, monkeypatch):
    p = tmp_path / "envsrc.csv"
    p.write_text("a\n1\n")
    monkeypatch.setenv("ICE_SOURCE_PATH", str(p))
    monkeypatch.setenv("ICE_NAMESPACE", "ing_env")
    monkeypatch.setenv("ICE_PLURALIZE_TABLE", "true")
    cfg = LoaderConfig.from_env()
    assert cfg.namespace == "ing_env"
    summary = csv_to_table_pipeline(spark, cfg)
    assert summary["exit_code"] == 0
    assert spark.table("ing_env.envsrcs").count() == 1  # pluralized


# --- VERDICT r11 ask #6: splittable CSV fast path ---------------------------


def test_clean_csv_reads_splittable_with_identical_output(spark, tmp_path):
    """A newline-free CSV must read with multiLine=False (each file
    splittable at maxPartitionBytes) and parse IDENTICALLY to the
    multiLine=True reference-parity mode."""
    from apache_iceberg_spark.ingest.loader import (
        csv_sample_has_embedded_newlines,
    )

    path = tmp_path / "big.csv"
    with open(path, "w") as f:
        f.write("id,name,score\n")
        for i in range(40_000):
            f.write(f'{i},"user {i}",{i * 0.5}\n')
    assert os.path.getsize(path) > 4 * 65536
    assert not csv_sample_has_embedded_newlines(str(path))

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try:
        fast = read_csv(spark, str(path))  # pre-probe picks splittable
        assert fast.rdd.getNumPartitions() > 1, (
            "clean CSV did not split — TB-scale ingestion would "
            "single-task"
        )
        slow = read_csv(spark, str(path), multiline=True)
        assert slow.rdd.getNumPartitions() == 1  # the old single-split
        assert fast.schema == slow.schema
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, slow.collect())
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_embedded_newline_csv_keeps_multiline(spark, tmp_path):
    from apache_iceberg_spark.ingest.loader import (
        csv_sample_has_embedded_newlines,
    )

    path = tmp_path / "notes.csv"
    with open(path, "w") as f:
        f.write("id,note\n")
        f.write('1,"line one\nline two"\n')
        f.write('2,"doubled "" quote, no newline"\n')
    assert csv_sample_has_embedded_newlines(str(path))
    df = read_csv(spark, str(path))  # pre-probe keeps multiLine=True
    rows = {r["id"]: r["note"] for r in df.collect()}
    assert rows[1] == "line one\nline two"
    assert rows[2] == 'doubled " quote, no newline'


def test_remote_and_missing_paths_stay_conservative():
    from apache_iceberg_spark.ingest.loader import (
        csv_sample_has_embedded_newlines,
    )

    assert csv_sample_has_embedded_newlines("https://x.example/data.csv")
    assert csv_sample_has_embedded_newlines("/nonexistent/dir/*.csv")
