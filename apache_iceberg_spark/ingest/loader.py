"""CSV → managed-table pipeline (reference parity: bot_iceberg_loader.py —
SURVEY.md §2.1 S1/S5, §2.10 C12-C14, §3.1).

Control flow mirrors the reference CLI: env config → source dispatch →
namespace ensure → per-file (or merged) load → create-or-replace → cleanup
→ summary. The execution differs by design: the columnar IR is a lazy
DataFrame instead of an in-RAM Arrow table, and the table write is a
distributed job (executors write data files; only the catalog commit is on
the driver).

Type surface (SURVEY.md §1.2): ingestion restricts schemas to the
reference's 8 types (string, double, float, long, int, timestamp, date,
boolean) with a permissive fall-back-to-string for anything else —
nested/decimal/interval columns become strings at the boundary, exactly
like the reference's arrow_to_iceberg_schema fallback.
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_iceberg_spark.ingest.naming import resolve_table_name
from apache_iceberg_spark.ingest.sources import (
    cleanup_temp_files,
    get_files_to_process,
)

# ---------------------------------------------------------------------------
# Configuration (env surface kept name-compatible with the reference,
# bot_iceberg_loader.py:140-162)
# ---------------------------------------------------------------------------


@dataclass
class LoaderConfig:
    source_path: str = ""
    glob_pattern: str = ""
    table_name: str = ""  # optional explicit name (single-source loads)
    namespace: str = "default"
    pluralize_table: bool = False
    glob_merge_table: bool = False  # C12: merge all matched files into one table
    catalog_type: str = "builtin"  # builtin | hadoop | rest (iceberg-gated)
    warehouse_path: str = ""
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_env(cls, env: dict | None = None) -> "LoaderConfig":
        e = os.environ if env is None else env
        return cls(
            source_path=e.get("ICE_SOURCE_PATH", ""),
            glob_pattern=e.get("ICE_GLOB_PATTERN", ""),
            table_name=e.get("ICE_TABLE_NAME", ""),
            namespace=e.get("ICE_NAMESPACE", "default"),
            pluralize_table=e.get("ICE_PLURALIZE_TABLE", "false").lower() == "true",
            glob_merge_table=e.get("ICE_GLOB_MERGE_TABLE", "false").lower() == "true",
            catalog_type=e.get("ICE_CATALOG_TYPE", "builtin").lower(),
            warehouse_path=e.get("ICE_WAREHOUSE_PATH", ""),
        )


# ---------------------------------------------------------------------------
# Structured JSON logging (C14)
# ---------------------------------------------------------------------------


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "ts": self.formatTime(record, "%Y-%m-%dT%H:%M:%S"),
            "level": record.levelname.lower(),
            "event": record.getMessage(),
        }
        payload.update(getattr(record, "ctx", {}))
        return json.dumps(payload)


def get_logger(name: str = "ingest", log_dir: str | None = None) -> logging.Logger:
    """JSON-lines logger; optionally also to ./logs/{name}_{ts}.log like the
    reference (bot_iceberg_loader.py:114-134)."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    handlers: list[logging.Handler] = [logging.StreamHandler()]
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")
        handlers.append(
            logging.FileHandler(os.path.join(log_dir, f"{name}_{stamp}.log"))
        )
    for h in handlers:
        h.setFormatter(_JsonFormatter())
        logger.addHandler(h)
    logger.propagate = False
    return logger


def _log(logger: logging.Logger, event: str, **ctx) -> None:
    logger.info(event, extra={"ctx": ctx})


# ---------------------------------------------------------------------------
# CSV read with the pinned 8-type surface (S1, §1.2)
# ---------------------------------------------------------------------------

#: Types the ingestion boundary admits (SURVEY.md §1.2 table).
CORE_TYPES = (
    T.StringType,
    T.DoubleType,
    T.FloatType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DateType,
    T.BooleanType,
)


def restrict_to_core_types(df: DataFrame) -> DataFrame:
    """Cast any column outside the 8-type surface to string (the
    reference's permissive fallback, bot_iceberg_loader.py:227-230)."""
    out = []
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, CORE_TYPES):
            out.append(F.col(f_.name))
        else:
            out.append(F.col(f_.name).cast("string").alias(f_.name))
    return df.select(*out)


def csv_sample_has_embedded_newlines(
    path: str, sample_bytes: int = 1 << 20, max_files: int = 8
) -> bool:
    """Pre-probe for the splittable fast path (VERDICT r11 ask #6): scan
    a prefix of up to ``max_files`` local CSV files for a newline INSIDE
    a quoted field — the one shape that needs ``multiLine=True``. Quote
    state toggles on ``\"`` (RFC-4180 doubled-quote escapes are two
    toggles, so they cancel); a ``\\n`` while in-quotes is an embedded
    newline. Returns True (= keep multiLine) when any is found, and
    CONSERVATIVELY True when the path is not local or not listable —
    only a provably-clean local sample unlocks the splittable read.
    Heuristic by construction (an embedded newline past every sampled
    prefix is invisible), which is why ``read_csv`` takes an explicit
    ``multiline=`` override for corpora known to carry late outliers."""
    import glob as _glob

    if "://" in path and not path.startswith("file://"):
        return True  # remote source: keep the reference-parity default
    local = path.removeprefix("file://")
    if os.path.isdir(local):
        candidates = sorted(_glob.glob(os.path.join(local, "*")))
    elif _glob.has_magic(local):
        candidates = sorted(_glob.glob(local))
    else:
        candidates = [local]
    candidates = [c for c in candidates if os.path.isfile(c)][:max_files]
    if not candidates:
        return True
    for c in candidates:
        try:
            with open(c, "rb") as f:
                chunk = f.read(sample_bytes)
        except OSError:
            return True
        in_quotes = False
        for b in chunk:
            if b == 0x22:  # '"'
                in_quotes = not in_quotes
            elif b == 0x0A and in_quotes:  # '\n' inside a quoted field
                return True
    return False


def read_csv(
    spark: SparkSession, path: str, multiline: bool | None = None
) -> DataFrame:
    """Header + schema inference + embedded newlines (reference read
    options, bot_iceberg_loader.py:178-180: use_threads ≙ parallel split
    read, newlines_in_values ≙ multiLine).

    ``multiLine=True`` makes EACH FILE a single split — a 1 TB CSV reads
    on one task, the scan that cannot parallelize. Round 12 (VERDICT r11
    ask #6): a pre-probe samples a prefix of the local file(s); when no
    quoted field in the sample contains a newline, the read drops to
    ``multiLine=False`` and Spark splits every file at
    ``spark.sql.files.maxPartitionBytes`` boundaries — the TB-scale
    ingestion path. Both modes parse identical output on newline-free
    data (the pre-probe pytest proves it on a multi-split file). Pass
    ``multiline=`` explicitly to pin either mode (e.g. True for a corpus
    whose embedded newlines start beyond the sampled prefix)."""
    if multiline is None:
        multiline = csv_sample_has_embedded_newlines(path)
    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("multiLine", multiline)
        .option("escape", '"')
        .csv(path)
    )
    return restrict_to_core_types(df)


# ---------------------------------------------------------------------------
# Table sink: create-or-replace + append (S5)
# ---------------------------------------------------------------------------


def _qualified(namespace: str, table: str) -> str:
    return f"{namespace}.{table}" if namespace else table


def ensure_namespace(spark: SparkSession, namespace: str) -> None:
    """C3 semantics: idempotent namespace creation."""
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")


def _clear_stale_location(spark: SparkSession, namespace: str, table: str) -> None:
    """Remove an orphaned managed-table directory.

    The in-memory catalog forgets tables across sessions while their
    warehouse directories persist; a subsequent create would then fail
    with LOCATION_ALREADY_EXISTS. Only local (file:) warehouses apply —
    object-store warehouses with a persistent catalog don't orphan."""
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    for prefix in ("file:", ""):
        if wh.startswith(prefix):
            path = os.path.join(wh.removeprefix("file:"), f"{namespace}.db", table)
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            return


def create_or_replace_table(
    spark: SparkSession, df: DataFrame, namespace: str, table: str
) -> str:
    """Drop-if-exists → create → load (reference contract,
    bot_iceberg_loader.py:284-316). On the built-in catalog this is a
    parquet saveAsTable; with an Iceberg catalog configured the same call
    becomes ``df.writeTo(ident).createOrReplace()`` and every load is a
    new snapshot (time travel for free)."""
    ensure_namespace(spark, namespace)
    ident = _qualified(namespace, table)
    spark.sql(f"DROP TABLE IF EXISTS {ident}")
    _clear_stale_location(spark, namespace, table)
    df.write.format("parquet").mode("overwrite").saveAsTable(ident)
    return ident


def append_to_table(spark: SparkSession, df: DataFrame, namespace: str, table: str) -> str:
    ident = _qualified(namespace, table)
    df.write.format("parquet").mode("append").saveAsTable(ident)
    return ident


# ---------------------------------------------------------------------------
# Pipeline orchestration (C13)
# ---------------------------------------------------------------------------


def process_single_file(
    spark: SparkSession,
    local_path: str,
    filename: str,
    config: LoaderConfig,
    logger: logging.Logger,
    explicit_name: str | None = None,
) -> dict:
    table = explicit_name or resolve_table_name(filename, config.pluralize_table)
    if not table:
        return {"file": filename, "status": "error", "error": "empty table name"}
    t0 = time.time()
    df = read_csv(spark, local_path)
    n_rows = df.count()
    ident = create_or_replace_table(spark, df, config.namespace, table)
    _log(
        logger,
        "table_loaded",
        table=ident,
        rows=n_rows,
        columns=len(df.columns),
        seconds=round(time.time() - t0, 3),
    )
    return {"file": filename, "table": ident, "rows": n_rows, "status": "ok"}


def csv_to_table_pipeline(
    spark: SparkSession, config: LoaderConfig | None = None
) -> dict:
    """End-to-end pipeline (reference: csv_to_iceberg_pipeline,
    bot_iceberg_loader.py:371-477). Returns a summary dict; ``exit_code``
    is 0 only if every file loaded."""
    if config is None:
        config = LoaderConfig.from_env()
    logger = get_logger()
    if not config.source_path:
        return {"status": "error", "error": "ICE_SOURCE_PATH not set", "exit_code": 2}

    files = get_files_to_process(config.source_path, config.glob_pattern)
    if not files:
        _log(logger, "no_files_matched", source=config.source_path)
        return {"status": "error", "error": "no files matched", "exit_code": 2}

    ensure_namespace(spark, config.namespace)
    results: list[dict] = []

    if config.glob_merge_table and len(files) > 1:
        # C12 implemented for real (dead config in the reference —
        # bot_iceberg_loader.py:148, never used): all files union into one
        # table, by-name so differing column orders align.
        table = config.table_name or resolve_table_name(
            files[0][1], config.pluralize_table
        )
        merged: DataFrame | None = None
        for local_path, _fname in files:
            part = read_csv(spark, local_path)
            merged = (
                part
                if merged is None
                else merged.unionByName(part, allowMissingColumns=True)
            )
        n_rows = merged.count()
        ident = create_or_replace_table(spark, merged, config.namespace, table)
        _log(logger, "merged_table_loaded", table=ident, rows=n_rows, files=len(files))
        results.append(
            {"file": f"{len(files)} merged", "table": ident, "rows": n_rows, "status": "ok"}
        )
    else:
        explicit = config.table_name if len(files) == 1 else None
        for local_path, fname in files:
            try:
                results.append(
                    process_single_file(
                        spark, local_path, fname, config, logger, explicit
                    )
                )
            except Exception as exc:  # per-file isolation, pipeline continues
                _log(logger, "file_failed", file=fname, error=str(exc))
                results.append({"file": fname, "status": "error", "error": str(exc)})

    cleanup_temp_files([p for p, _ in files])
    n_ok = sum(1 for r in results if r["status"] == "ok")
    summary = {
        "status": "ok" if n_ok == len(results) else "partial" if n_ok else "error",
        "files": len(results),
        "loaded": n_ok,
        "results": results,
        "exit_code": 0 if n_ok == len(results) else 1,
    }
    _log(logger, "pipeline_done", **{k: v for k, v in summary.items() if k != "results"})
    return summary
