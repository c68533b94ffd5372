"""SparkSession factory for the engine.

The reference configures its engines per-environment (REST/Nessie catalog or
local SQLite catalog — ``bot_iceberg_loader.py:245-281``). We mirror that
stance: one factory that produces a session tuned for scale-out execution
(AQE, Arrow interchange, sensible shuffle sizing) and wires in an Iceberg
catalog when the Iceberg Spark runtime jar is on the classpath, falling back
to Spark's built-in catalog (parquet tables in a local warehouse) otherwise.

Scale notes (100 TB design):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast conversion replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; on a real
  cluster set it to ~2-3x total cores and let AQE coalesce.
- Arrow execution enabled so ``toPandas``/pandas-UDF boundaries are columnar
  batch transfers, matching the reference's Arrow-centric design
  (``query_iceberg.ipynb:210-214``).
"""

from __future__ import annotations

import os
from typing import Mapping

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "apache-iceberg-spark"

#: Env var contract shared with the driver's bench harness.
ENV_CPUS = "SPARK_GRAFT_CPUS"

#: Catalog name used when the Iceberg runtime is available.
ICEBERG_CATALOG = "ice"


def find_iceberg_jar() -> str | None:
    """Locate an ``iceberg-spark-runtime`` jar anywhere Spark could load it.

    Probed per session start (cheap directory listings), so dropping the
    jar into any of these locations — or pointing
    ``$SPARK_GRAFT_ICEBERG_JAR`` at it — flips the real Iceberg path on
    with zero code change:

    1. ``$SPARK_GRAFT_ICEBERG_JAR`` (explicit file override)
    2. pyspark's bundled ``jars/`` directory
    3. ``$SPARK_HOME/jars``
    4. ``~/.ivy2/jars`` (``spark.jars.packages`` download cache)
    5. ``~/.m2/repository/org/apache/iceberg/**`` (Maven local repo)
    """
    override = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if override and os.path.isfile(override):
        return override
    flat_dirs = []
    try:
        import pyspark

        flat_dirs.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:  # pragma: no cover
        pass
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        flat_dirs.append(os.path.join(spark_home, "jars"))
    flat_dirs.append(os.path.expanduser("~/.ivy2/jars"))
    for d in flat_dirs:
        try:
            names = sorted(os.listdir(d))
        except OSError:
            continue
        for f in names:
            if f.startswith("iceberg-spark-runtime") and f.endswith(".jar"):
                return os.path.join(d, f)
    import glob as _glob

    m2 = sorted(
        _glob.glob(
            os.path.expanduser(
                "~/.m2/repository/org/apache/iceberg/"
                "iceberg-spark-runtime*/**/iceberg-spark-runtime*.jar"
            ),
            recursive=True,
        )
    )
    return m2[0] if m2 else None


def _iceberg_jar_available() -> bool:
    """True if an iceberg-spark-runtime jar is visible to this Spark install."""
    return find_iceberg_jar() is not None


def iceberg_catalog_conf(
    mode: str,
    *,
    name: str = ICEBERG_CATALOG,
    warehouse: str = "iceberg-warehouse",
    uri: str | None = None,
) -> dict[str, str]:
    """Spark conf for an Iceberg catalog, by deployment mode.

    Mirrors the reference's per-environment catalog selection
    (``bot_iceberg_loader.py:245-281``: Nessie/REST catalog in production,
    SQL/SQLite catalog for local dev) as a pure conf dict so the C1/C2
    surface is testable without the runtime jar or a live endpoint:

    - ``rest``: a REST catalog server (Nessie, Polaris, Lakekeeper…);
      requires ``uri``.
    - ``jdbc``: SQL-backed catalog (the reference's SQLite dev path);
      requires ``uri`` (a JDBC URL, e.g. ``jdbc:sqlite:catalog.db``).
    - ``hadoop``: filesystem-only catalog for local dev/tests.

    ``get_spark`` applies this dict verbatim when the
    ``iceberg-spark-runtime`` jar is present on the classpath.
    """
    base = f"spark.sql.catalog.{name}"
    conf: dict[str, str] = {
        base: "org.apache.iceberg.spark.SparkCatalog",
        f"{base}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }
    if mode == "hadoop":
        conf[f"{base}.type"] = "hadoop"
    elif mode in ("rest", "jdbc"):
        if not uri:
            raise ValueError(f"iceberg_catalog_conf: mode={mode!r} requires uri")
        conf[f"{base}.type"] = mode
        conf[f"{base}.uri"] = uri
    else:
        raise ValueError(f"iceberg_catalog_conf: unknown mode {mode!r}")
    return conf


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    warehouse: str | None = None,
    extra_conf: Mapping[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Parameters
    ----------
    cpus:
        local[] parallelism; defaults to ``$SPARK_GRAFT_CPUS`` or all cores.
    shuffle_partitions:
        pre-AQE shuffle partition count; defaults to ``cpus``.
    warehouse:
        warehouse directory for managed tables (catalog surface). Defaults to
        ``./spark-warehouse`` under the current directory.
    """
    if cpus is None:
        cpus = int(os.environ.get(ENV_CPUS, 0)) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- Adaptive execution: runtime re-planning at scale -------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce post-shuffle partitions by size, not up to the default
        # parallelism: small intermediate shuffles collapse to few tasks
        # (an order of magnitude off multi-stage query latency here) and
        # at 100 TB partition width follows data volume, not core count.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- Columnar boundaries ------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- Scan sizing: keep splits bounded so tasks stay memory-safe ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Some testdata generations store `events.ts` as TIMESTAMP(NANOS);
        # Spark has no nanos timestamp type, so read as long and convert
        # (tables.py, which also normalizes the MICROS-NTZ generation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- Quieter, deterministic behavior ------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )

    if warehouse is not None:
        builder = builder.config("spark.sql.warehouse.dir", warehouse)

    jar = find_iceberg_jar()
    if jar is not None:
        # Iceberg native Spark integration (SURVEY.md §1.1): a hadoop-type
        # catalog for local dev, mirroring the reference's SQLite-for-dev
        # stance (blog-zero-cost-data-lakehouse-part-2.md:161). Production
        # deployments switch to iceberg_catalog_conf("rest", uri=...) to
        # hit a Nessie/REST catalog exactly like
        # bot_iceberg_loader.py:251-263 — config-only change.
        ice_wh = warehouse or os.path.abspath("iceberg-warehouse")
        for k, v in iceberg_catalog_conf("hadoop", warehouse=ice_wh).items():
            builder = builder.config(k, v)
        # A jar outside pyspark's bundled jars/ (ivy cache, maven repo,
        # explicit override) isn't on the classpath by default.
        import pyspark

        bundled = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        if os.path.dirname(os.path.abspath(jar)) != bundled:
            builder = builder.config("spark.jars", jar)

    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    return builder.getOrCreate()


def stop_spark() -> None:
    """Stop the active session if any (test teardown helper)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def release_plan_caches(spark: SparkSession) -> None:
    """Release every ``# plan-cache`` frame left by operator invocations.

    Persist-lifecycle convention (VERDICT r6 ask #3): an operator that
    persists a frame must either unpersist it before returning, or — when
    the cache is a multi-consumer frame referenced by the RETURNED lazy
    plan, which Spark gives us no after-action hook to release — mark the
    site ``# plan-cache`` (enforced by
    ``tests/test_round7_ops.py::test_persist_sites_released_or_justified``)
    and rely on the caller to drop it once the result is materialized.
    A long-running driver calls this between queries; tests call it in
    teardown. ``clearCache`` only drops storage blocks — the plans stay
    valid and simply recompute if re-collected."""
    spark.catalog.clearCache()
