"""Workspace-level multi-table commits — the documented Nessie property
the per-table snapshot log cannot express (VERDICT r9 ask #2).

Nessie commits are CATALOG-level: one commit can change several tables
atomically, so a reader at any ref sees all of a publish or none of it
("transactions across tables" — the point of a catalog-level version
store; endpoint matrix at blog-zero-cost-data-lakehouse.md:373-397).
``catalog/snapshots.py``'s emulation keeps ``_versions.json`` inside ONE
table path, so a two-table publish there is two separate commits with a
torn window where readers see one but not the other.

This module lifts the same commit-log design one level up:

    <workspace>/
      _versions.json     # ONE log for ALL tables: [{version, ts_ms,
                         #   tables: {name: {"adds": [...]}|{"set": [...]}}}]
      _refs.json         # workspace-level branches/tags (same shape as
                         #   the table-level refs)
      <table>/w{N}-<tok>/  # immutable data dirs, one per table per commit

A commit entry names only the tables it TOUCHED, each as a delta
(``adds``) or a restatement (``set``) — the same O(commits) metadata
discipline the table-level log adopted in round 10. Resolving table T at
version V walks the log backwards collecting adds until a set: readers
of one version therefore see every table exactly as that single commit
left the workspace — both tables of a publish, or neither.

The commit point is the identical CAS: data dirs first (uniquely named),
then verify-head + append + atomic rename under the ``O_EXCL`` lock, so
a lost race raises ``CommitConflict`` (imported from snapshots — one
conflict type across both layers).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_spark.catalog.snapshots import (
    CommitConflict,
    _data_dir,
    _log_lock,
)

_LOG = "_versions.json"
_REFS = "_refs.json"


def _read_log(ws_path: str) -> list[dict]:
    try:
        with open(os.path.join(ws_path, _LOG)) as f:
            return json.load(f)
    except FileNotFoundError:
        return []


def _write_log(ws_path: str, log: list[dict]) -> None:
    tmp = os.path.join(ws_path, _LOG + ".tmp")
    with open(tmp, "w") as f:
        json.dump(log, f)
    os.replace(tmp, os.path.join(ws_path, _LOG))


def ws_commit(
    ws_path: str,
    dfs: dict[str, DataFrame],
    mode: str = "append",
    ts_ms: int | None = None,
    partition_by: dict[str, list[str]] | None = None,
    idempotency_key: str | None = None,
) -> int:
    """Commit EVERY table in ``dfs`` as ONE atomic workspace version.

    ``mode='append'`` extends each table's file set (a table not yet in
    the workspace starts fresh either way); ``mode='overwrite'``
    restates the named tables. Tables absent from ``dfs`` are untouched
    and keep their state in the new version — so a reader of version N
    resolves a CONSISTENT cross-table state from one commit entry, the
    property a per-table log cannot give (the torn-publish window;
    test_round10_ops proves the dual). Returns the new version.

    All data directories are written BEFORE the log swap; the swap is a
    CAS (raises ``CommitConflict`` on a lost race), so a crash or lost
    race leaves only uniquely-named orphan dirs, never a half-visible
    publish.

    ``idempotency_key``: the same retry contract as the table-level
    ``commit_append_ref`` — a commit bearing an already-present key
    returns the original version without writing, so a streaming
    foreachBatch publisher passing the batch id gets exactly-once
    multi-table publishes across Spark's batch re-runs (st20). The
    workspace log is linear, so the scan is the whole log (O(commits)
    driver-side JSON, no data touched)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    if not dfs:
        raise ValueError("ws_commit needs at least one table")
    os.makedirs(ws_path, exist_ok=True)
    log = _read_log(ws_path)
    if idempotency_key is not None:
        for e in log:
            if e.get("idempotency_key") == idempotency_key:
                return e["version"]
    head = log[-1]["version"] if log else None
    version = (head + 1) if head is not None else 1
    tables: dict[str, dict] = {}
    for name, df in dfs.items():
        tdir = os.path.join(ws_path, name)
        os.makedirs(tdir, exist_ok=True)
        ddir = _data_dir(tdir, "w", version)
        w = df.write.mode("overwrite")
        pby = (partition_by or {}).get(name)
        if pby:
            w = w.partitionBy(*pby)
        w.parquet(ddir)
        exists = _resolve_table(log, name) is not None
        if mode == "overwrite" or not exists:
            tables[name] = {"set": [ddir]}
        else:
            tables[name] = {"adds": [ddir]}
    with _log_lock(ws_path):
        cur = _read_log(ws_path)
        cur_head = cur[-1]["version"] if cur else None
        if cur_head != head:
            raise CommitConflict(
                f"workspace {ws_path} head moved {head} -> {cur_head} "
                f"during commit of v{version}; re-read and retry"
            )
        entry = {
            "version": version,
            "ts_ms": int(time.time() * 1000) if ts_ms is None else ts_ms,
            "tables": tables,
        }
        if idempotency_key is not None:
            entry["idempotency_key"] = idempotency_key
        cur.append(entry)
        _write_log(ws_path, cur)
    return version


def _resolve_table(
    log: list[dict], table: str, version: int | None = None
) -> list[str] | None:
    """Table ``table``'s full file set at ``version`` (default: head):
    walk backwards collecting ``adds`` until a ``set``. None if the
    table does not exist at that version."""
    if version is None:
        upto = log
    else:
        upto = [e for e in log if e["version"] <= version]
        if not upto or upto[-1]["version"] != version:
            have = [e["version"] for e in log]
            raise ValueError(f"version {version} not found (have {have})")
    chain: list[list[str]] = []
    for e in reversed(upto):
        t = e["tables"].get(table)
        if t is None:
            continue
        if "set" in t:
            chain.append(t["set"])
            break
        chain.append(t["adds"])
    else:
        if not chain:
            return None
    out: list[str] = []
    for part in reversed(chain):
        out.extend(part)
    return out


def ws_read(
    spark: SparkSession,
    ws_path: str,
    table: str,
    version: int | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Read one table at a workspace version or ref. Because the version
    is WORKSPACE-scoped, two ``ws_read`` calls with the same version (or
    the same tag) are guaranteed mutually consistent — the cross-table
    read contract m34 oracle-checks."""
    from apache_iceberg_spark.catalog.snapshots import _read_dirs

    if ref is not None:
        if version is not None:
            raise ValueError("pass version or ref, not both")
        version = ws_resolve_ref(ws_path, ref)
    log = _read_log(ws_path)
    if not log:
        raise ValueError(f"no commits at {ws_path}")
    paths = _resolve_table(log, table, version)
    if paths is None:
        at = version if version is not None else log[-1]["version"]
        raise ValueError(f"table {table!r} does not exist at v{at}")
    return _read_dirs(spark, paths)


def ws_list_versions(ws_path: str) -> list[dict]:
    return list(_read_log(ws_path))


def ws_list_tables(ws_path: str, version: int | None = None) -> list[str]:
    """Every table that exists at ``version`` (default head)."""
    log = _read_log(ws_path)
    names = {n for e in log for n in e["tables"]}
    return sorted(
        n for n in names if _resolve_table(log, n, version) is not None
    )


def _read_refs(ws_path: str) -> dict:
    try:
        with open(os.path.join(ws_path, _REFS)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"branches": {}, "tags": {}}


def _write_refs(ws_path: str, refs: dict) -> None:
    tmp = os.path.join(ws_path, _REFS + ".tmp")
    with open(tmp, "w") as f:
        json.dump(refs, f)
    os.replace(tmp, os.path.join(ws_path, _REFS))


def ws_resolve_ref(ws_path: str, ref: str) -> int:
    refs = _read_refs(ws_path)
    if ref in refs["tags"]:
        return refs["tags"][ref]
    if ref in refs["branches"]:
        return refs["branches"][ref]
    if ref == "main":
        log = _read_log(ws_path)
        if not log:
            raise ValueError(f"no commits at {ws_path}")
        return log[-1]["version"]
    raise ValueError(f"unknown ref {ref!r} at {ws_path}")


def ws_create_tag(ws_path: str, name: str, version: int | None = None) -> int:
    """Pin a workspace version under a name — because the version spans
    EVERY table, the tag is a consistent cross-table snapshot ('the
    state we audited'), which is exactly what a per-table tag cannot
    promise."""
    refs = _read_refs(ws_path)
    if name in refs["tags"] or name in refs["branches"]:
        raise ValueError(f"ref {name!r} already exists")
    log = _read_log(ws_path)
    if not log:
        raise ValueError(f"no commits at {ws_path}")
    if version is None:
        version = log[-1]["version"]
    elif version not in {e["version"] for e in log}:
        raise ValueError(f"version {version} not found")
    refs["tags"][name] = version
    _write_refs(ws_path, refs)
    return version
