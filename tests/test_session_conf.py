"""Lock the C1/C2 catalog-configuration surface (VERDICT r1 item 6).

The sandbox has no iceberg-spark-runtime jar and no network, so the REST
and JDBC catalog modes cannot be exercised end-to-end; what CAN be locked
is the exact ``spark.sql.catalog.*`` conf each mode emits — the shape the
reference builds in ``bot_iceberg_loader.py:245-281`` (REST/Nessie in
production, SQL/SQLite for dev).
"""

from __future__ import annotations

import pytest

from apache_iceberg_spark.session import ICEBERG_CATALOG, iceberg_catalog_conf

_EXT = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
_IMPL = "org.apache.iceberg.spark.SparkCatalog"


def test_rest_mode_conf():
    conf = iceberg_catalog_conf(
        "rest", warehouse="s3://wh", uri="http://nessie.example:19120/iceberg"
    )
    base = f"spark.sql.catalog.{ICEBERG_CATALOG}"
    assert conf == {
        base: _IMPL,
        f"{base}.type": "rest",
        f"{base}.uri": "http://nessie.example:19120/iceberg",
        f"{base}.warehouse": "s3://wh",
        "spark.sql.extensions": _EXT,
    }


def test_jdbc_mode_conf():
    conf = iceberg_catalog_conf(
        "jdbc", name="dev", warehouse="/tmp/wh", uri="jdbc:sqlite:catalog.db"
    )
    assert conf == {
        "spark.sql.catalog.dev": _IMPL,
        "spark.sql.catalog.dev.type": "jdbc",
        "spark.sql.catalog.dev.uri": "jdbc:sqlite:catalog.db",
        "spark.sql.catalog.dev.warehouse": "/tmp/wh",
        "spark.sql.extensions": _EXT,
    }


def test_hadoop_mode_conf():
    conf = iceberg_catalog_conf("hadoop", warehouse="/tmp/wh")
    base = f"spark.sql.catalog.{ICEBERG_CATALOG}"
    assert conf[f"{base}.type"] == "hadoop"
    assert f"{base}.uri" not in conf


@pytest.mark.parametrize("mode", ["rest", "jdbc"])
def test_remote_modes_require_uri(mode):
    with pytest.raises(ValueError, match="requires uri"):
        iceberg_catalog_conf(mode, warehouse="/tmp/wh")


def test_unknown_mode_rejected():
    with pytest.raises(ValueError, match="unknown mode"):
        iceberg_catalog_conf("glue", warehouse="/tmp/wh")


# --- Jar discovery probe (VERDICT r2 item 6) -------------------------------


def test_find_iceberg_jar_absent_here():
    """The sandbox has no runtime jar anywhere — the probe must say so
    (this is the guard that keeps the emulation path active)."""
    from apache_iceberg_spark.session import (
        _iceberg_jar_available,
        find_iceberg_jar,
    )

    assert find_iceberg_jar() is None
    assert _iceberg_jar_available() is False


def test_find_iceberg_jar_env_override(tmp_path, monkeypatch):
    """Pointing $SPARK_GRAFT_ICEBERG_JAR at a jar file flips discovery on
    with zero code change; a dangling path is ignored."""
    from apache_iceberg_spark.session import find_iceberg_jar

    jar = tmp_path / "iceberg-spark-runtime-4.0_2.13-1.8.0.jar"
    monkeypatch.setenv("SPARK_GRAFT_ICEBERG_JAR", str(jar))
    assert find_iceberg_jar() is None  # dangling: not a file yet
    jar.write_bytes(b"PK")
    assert find_iceberg_jar() == str(jar)


def test_find_iceberg_jar_spark_home(tmp_path, monkeypatch):
    """A jar dropped into $SPARK_HOME/jars is discovered without the
    override (the standard admin install path)."""
    from apache_iceberg_spark.session import find_iceberg_jar

    monkeypatch.delenv("SPARK_GRAFT_ICEBERG_JAR", raising=False)
    jars = tmp_path / "jars"
    jars.mkdir()
    jar = jars / "iceberg-spark-runtime-4.0_2.13-1.8.0.jar"
    jar.write_bytes(b"PK")
    monkeypatch.setenv("SPARK_HOME", str(tmp_path))
    assert find_iceberg_jar() == str(jar)
