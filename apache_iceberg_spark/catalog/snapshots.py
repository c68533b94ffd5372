"""Snapshot store on plain parquet: the Iceberg commit model, emulated.

Every Iceberg write commits a new immutable snapshot; reads resolve the
current (or an explicitly requested) snapshot via table metadata, and
``expire_snapshots`` garbage-collects old ones
(``bot_iceberg_loader.py:307`` relies on append-creates-a-snapshot;
SURVEY.md §1.1). With no runtime jar in this environment (README
"Iceberg runtime status"), ``catalog/ddl.py``'s real snapshot ops are
gated; this module provides the same *semantics* on a versioned
directory layout:

    <table>/
      _versions.json          # commit log: [{version, ts_ms, path}, ...]
      v1/  v2/  ...           # immutable parquet snapshot directories

Commits are copy-on-write: a new version directory plus an atomic
rewrite of the commit log (write-temp + rename). Readers of version N
are never affected by later commits or expiry of other versions — the
snapshot-isolation property m5 demonstrates, factored here into a
reusable store with time travel both by version and by timestamp.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

_LOG = "_versions.json"


def _read_log(table_path: str) -> list[dict]:
    try:
        with open(os.path.join(table_path, _LOG)) as f:
            return json.load(f)
    except FileNotFoundError:
        return []


def _write_log(table_path: str, log: list[dict]) -> None:
    tmp = os.path.join(table_path, _LOG + ".tmp")
    with open(tmp, "w") as f:
        json.dump(log, f)
    os.replace(tmp, os.path.join(table_path, _LOG))  # atomic commit swap


def commit_snapshot(
    df: DataFrame, table_path: str, ts_ms: int | None = None
) -> int:
    """Write ``df`` as the table's next immutable snapshot; returns the
    new version number. Copy-on-write: existing versions are untouched.

    Crash-safe for a single writer: the version directory is written in
    overwrite mode, so a commit that died after writing v{N}/ but before
    the log swap leaves an orphan the NEXT commit simply rewrites — the
    log rename is the commit point. Concurrent committers are out of
    scope for this emulation (real Iceberg arbitrates commits with a
    catalog compare-and-swap; a filesystem log cannot)."""
    os.makedirs(table_path, exist_ok=True)
    log = _read_log(table_path)
    version = (log[-1]["version"] + 1) if log else 1
    vdir = os.path.join(table_path, f"v{version}")
    df.write.mode("overwrite").parquet(vdir)
    log.append(
        {
            "version": version,
            "ts_ms": int(time.time() * 1000) if ts_ms is None else ts_ms,
            "path": vdir,
        }
    )
    _write_log(table_path, log)
    return version


def read_snapshot_dirs(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    as_of_ts_ms: int | None = None,
) -> DataFrame:
    """Time travel: the latest snapshot by default, ``VERSION AS OF`` via
    ``version``, ``TIMESTAMP AS OF`` via ``as_of_ts_ms`` (largest commit
    at-or-before the timestamp) — the fallback twin of
    ``catalog.ddl.read_snapshot``."""
    log = _read_log(table_path)
    if not log:
        raise ValueError(f"no snapshots at {table_path}")
    if version is not None:
        matches = [e for e in log if e["version"] == version]
        if not matches:
            raise ValueError(f"version {version} not found (have "
                             f"{[e['version'] for e in log]})")
        entry = matches[0]
    elif as_of_ts_ms is not None:
        at_or_before = [e for e in log if e["ts_ms"] <= as_of_ts_ms]
        if not at_or_before:
            raise ValueError(f"no snapshot at or before {as_of_ts_ms}")
        # commit_snapshot accepts caller-supplied ts_ms, so the log is
        # not guaranteed ts-ordered — pick the max timestamp, not the tail
        entry = max(at_or_before, key=lambda e: e["ts_ms"])
    else:
        entry = log[-1]
    return spark.read.parquet(entry["path"])


def list_snapshots(table_path: str) -> list[dict]:
    """The commit log (version, ts_ms, path), oldest first."""
    return list(_read_log(table_path))


def expire_snapshots_dirs(
    table_path: str, older_than_ms: int, keep_last: int = 1
) -> list[int]:
    """Expire snapshots committed before ``older_than_ms``, always
    retaining the ``keep_last`` most recent — Iceberg's
    ``expire_snapshots(older_than, retain_last)`` contract. Returns the
    expired version numbers; their directories are deleted and the commit
    log is rewritten atomically."""
    import shutil

    log = _read_log(table_path)
    if len(log) <= keep_last:
        return []
    protected = {e["version"] for e in log[-keep_last:]}
    expired = [
        e
        for e in log[:-keep_last]
        if e["ts_ms"] < older_than_ms and e["version"] not in protected
    ]
    if not expired:
        return []
    keep = [e for e in log if e not in expired]
    _write_log(table_path, keep)
    for e in expired:
        shutil.rmtree(e["path"], ignore_errors=True)
    return [e["version"] for e in expired]
