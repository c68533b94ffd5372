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
      _versions.json          # commit log: [{version, ts_ms, paths}, ...]
      v1/  v2/  ...           # immutable parquet snapshot directories
      d2/  d3/  ...           # immutable append-delta directories

Commits come in two shapes, exactly like Iceberg's:

- ``commit_snapshot`` (overwrite): a new full version directory; the
  snapshot's file set is that directory alone.
- ``commit_append``: only the appended batch is written (``d{N}/``); the
  snapshot's file set is the parent's file LIST plus the new directory —
  data files are shared across snapshots by reference, never copied,
  which is the actual Iceberg manifest-list mechanism (a snapshot is a
  list of files, not a copy of the table).

Both end with an atomic rewrite of the commit log (write-temp + rename).
Readers of version N are never affected by later commits or expiry of
other versions — the snapshot-isolation property m5 demonstrates.
``read_incremental`` resolves the file sets of two snapshots and plans a
scan over their DIFFERENCE: the Iceberg incremental append scan, planned
from metadata only (m11).
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
    df: DataFrame,
    table_path: str,
    ts_ms: int | None = None,
    partition_by: list[str] | None = None,
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
    w = df.write.mode("overwrite")
    if partition_by:
        # Hive-style partition directories inside the immutable snapshot
        # dir — Iceberg's partition spec on the emulation: readers prune
        # whole partition directories from a literal partition predicate.
        w = w.partitionBy(*partition_by)
    w.parquet(vdir)
    log.append(
        {
            "version": version,
            "ts_ms": int(time.time() * 1000) if ts_ms is None else ts_ms,
            "path": vdir,
        }
    )
    _write_log(table_path, log)
    return version


def _entry_paths(entry: dict) -> list[str]:
    """A snapshot's data-file set (list of directories). Overwrite commits
    store a single ``path``; append commits store the shared ``paths``."""
    return entry["paths"] if "paths" in entry else [entry["path"]]


def commit_append(
    df: DataFrame,
    table_path: str,
    ts_ms: int | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Append ``df`` as the table's next snapshot WITHOUT rewriting any
    existing data: only the new batch is written (``d{N}/``), and the new
    snapshot's file set references the parent's files plus it — Iceberg's
    ``table.append`` (bot_iceberg_loader.py:307), where a commit is a new
    manifest list over mostly-shared data files. Returns the new version.
    Requires an existing snapshot (append to nothing is commit_snapshot's
    job)."""
    log = _read_log(table_path)
    if not log:
        raise ValueError(f"no snapshots at {table_path}; commit_snapshot first")
    version = log[-1]["version"] + 1
    ddir = os.path.join(table_path, f"d{version}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ddir)
    log.append(
        {
            "version": version,
            "ts_ms": int(time.time() * 1000) if ts_ms is None else ts_ms,
            "paths": _entry_paths(log[-1]) + [ddir],
        }
    )
    _write_log(table_path, log)
    return version


def _read_dirs(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Scan a snapshot's data-directory set. Hive-partitioned tables need
    each directory read with its own ``basePath`` (a bare multi-path read
    refuses to unify partition discovery across roots); the filter-through-
    union rewrite keeps partition pruning effective on every branch."""
    dfs = [
        spark.read.option("basePath", p).parquet(p) for p in paths
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def read_incremental(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Incremental append scan: the rows committed AFTER ``from_version``
    up to and including ``to_version`` (default: the latest snapshot) —
    Iceberg's incremental read (``start-snapshot-id``/``end-snapshot-id``),
    the input contract of every CDC-style downstream consumer.

    Planned from METADATA only: the two snapshots' file sets are
    difference'd on the driver (O(#files), no data touched) and the
    returned frame scans just the delta files — at 100 TB a consumer
    processes the day's appends, never the table. Overwrite commits in
    the range make the append-diff ill-defined (files were rewritten, not
    added); like Iceberg's incremental scan, that raises."""
    log = _read_log(table_path)
    by_v = {e["version"]: e for e in log}
    if from_version not in by_v:
        raise ValueError(f"version {from_version} not found")
    to_entry = log[-1] if to_version is None else by_v.get(to_version)
    if to_entry is None:
        raise ValueError(f"version {to_version} not found")
    base = set(_entry_paths(by_v[from_version]))
    target = _entry_paths(to_entry)
    if not base.issubset(target):
        raise ValueError(
            "overwrite commit between the two snapshots; "
            "incremental append scan is undefined"
        )
    delta = [p for p in target if p not in base]
    if not delta:
        return _read_dirs(spark, target).limit(0)
    return _read_dirs(spark, delta)


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
    return _read_dirs(spark, _entry_paths(entry))


def list_snapshots(table_path: str) -> list[dict]:
    """The commit log (version, ts_ms, path), oldest first."""
    return list(_read_log(table_path))


# ---------------------------------------------------------------------------
# Git-like refs over the snapshot log — the Nessie branch/tag surface
# (SURVEY §2.11; reference: blog-zero-cost-data-lakehouse.md:373-397),
# emulated the same way S8/m5 emulate metadata-pointer reads: commits are
# globally sequenced in ``_versions.json`` exactly as before, and
# ``_refs.json`` holds named POINTERS into that log (branches move, tags
# never do) — git's object-store/refs split. Everything is metadata-only:
# creating a branch or tag, and merging one, never reads or copies a data
# byte, which is precisely why Nessie calls them zero-cost. The pre-ref
# API (commit_snapshot/commit_append/read_snapshot_dirs) keeps its linear-
# history semantics for existing callers; multi-lineage tables use the
# ``*_ref`` functions, whose log entries also record ``parent`` so merge
# can decide fast-forward by real ancestry, not file-set heuristics.

_REFS = "_refs.json"


def _read_refs(table_path: str) -> dict:
    try:
        with open(os.path.join(table_path, _REFS)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"branches": {}, "tags": {}}


def _write_refs(table_path: str, refs: dict) -> None:
    tmp = os.path.join(table_path, _REFS + ".tmp")
    with open(tmp, "w") as f:
        json.dump(refs, f)
    os.replace(tmp, os.path.join(table_path, _REFS))


def _resolve_ref(table_path: str, ref: str) -> int:
    """Ref name -> version number. ``main`` lazily means the log tail
    until a branch operation pins it (pre-ref tables are all-main)."""
    refs = _read_refs(table_path)
    if ref in refs["branches"]:
        return refs["branches"][ref]
    if ref in refs["tags"]:
        return refs["tags"][ref]
    if ref == "main":
        log = _read_log(table_path)
        if not log:
            raise ValueError(f"no snapshots at {table_path}")
        return log[-1]["version"]
    raise ValueError(f"unknown ref {ref!r} at {table_path}")


def _ensure_main(table_path: str, refs: dict) -> dict:
    if "main" not in refs["branches"]:
        log = _read_log(table_path)
        if not log:
            raise ValueError(f"no snapshots at {table_path}")
        refs["branches"]["main"] = log[-1]["version"]
    return refs


def create_branch(table_path: str, name: str, from_ref: str = "main") -> int:
    """Nessie ``CREATE BRANCH <name> FROM <ref>``: a movable pointer at
    the source ref's current version. O(1) metadata; no data touched."""
    version = _resolve_ref(table_path, from_ref)
    refs = _ensure_main(table_path, _read_refs(table_path))
    if name in refs["branches"] or name in refs["tags"]:
        raise ValueError(f"ref {name!r} already exists")
    refs["branches"][name] = version
    _write_refs(table_path, refs)
    return version


def create_tag(table_path: str, name: str, from_ref: str = "main") -> int:
    """Nessie ``CREATE TAG``: an IMMUTABLE pointer — later commits on any
    branch never move it, so 'the audited state' stays addressable by
    name forever (until explicitly deleted)."""
    version = _resolve_ref(table_path, from_ref)
    refs = _ensure_main(table_path, _read_refs(table_path))
    if name in refs["branches"] or name in refs["tags"]:
        raise ValueError(f"ref {name!r} already exists")
    refs["tags"][name] = version
    _write_refs(table_path, refs)
    return version


def commit_append_ref(
    df: DataFrame,
    table_path: str,
    branch: str,
    ts_ms: int | None = None,
    partition_by: list[str] | None = None,
    idempotency_key: str | None = None,
) -> int:
    """``commit_append`` onto a BRANCH: parents on the branch head (not
    the global log tail), records the parent for ancestry, and moves only
    that branch's pointer — commits on ``etl`` are invisible to ``main``
    readers until merged, Nessie's isolated-ingest workflow.

    ``idempotency_key``: a caller-chosen token recorded in the commit
    entry; a retry bearing the same key on the same branch returns the
    already-committed version WITHOUT writing again. Streaming
    foreachBatch sinks pass the micro-batch id here — Spark re-runs a
    batch with the same id after failure/restart, and without the key a
    retried batch would double-append (round-9 self-review; the
    exactly-once contract every real table sink implements via the
    batchId)."""
    refs = _ensure_main(table_path, _read_refs(table_path))
    if branch in refs["tags"]:
        raise ValueError(f"cannot commit to tag {branch!r}")
    if branch not in refs["branches"]:
        raise ValueError(f"unknown branch {branch!r}")
    parent_v = refs["branches"][branch]
    log = _read_log(table_path)
    by_v = {e["version"]: e for e in log}
    if idempotency_key is not None:
        # Walk the branch lineage for a commit bearing the same key.
        v: int | None = parent_v
        while v is not None:
            entry = by_v[v]
            if entry.get("idempotency_key") == idempotency_key:
                return v
            v = entry.get("parent")
    version = log[-1]["version"] + 1
    ddir = os.path.join(table_path, f"d{version}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ddir)
    entry = {
        "version": version,
        "ts_ms": int(time.time() * 1000) if ts_ms is None else ts_ms,
        "paths": _entry_paths(by_v[parent_v]) + [ddir],
        "parent": parent_v,
    }
    if idempotency_key is not None:
        entry["idempotency_key"] = idempotency_key
    log.append(entry)
    _write_log(table_path, log)
    refs["branches"][branch] = version
    _write_refs(table_path, refs)
    return version


def read_ref(spark: SparkSession, table_path: str, ref: str) -> DataFrame:
    """Read a table AT a named ref — Nessie's ``table@branch`` /
    ``table@tag`` addressing. Resolution is two metadata lookups; the
    scan covers exactly the ref head's file set."""
    return read_snapshot_dirs(
        spark, table_path, version=_resolve_ref(table_path, ref)
    )


def merge_branch(
    table_path: str, src: str, into: str = "main", ts_ms: int | None = None
) -> int:
    """Merge branch ``src`` into ``into``. Allowed exactly when ``into``'s
    head is an ANCESTOR of ``src``'s head (the target did not move since
    the branch point) — then the merge is a metadata-only commit on the
    target carrying the source head's file set, and both pointers advance
    to it. If the target moved, this raises, matching Nessie's
    conflict-on-merge behavior (resolving diverged table states needs a
    rebase, which the emulation deliberately does not fake). O(branch
    length) driver-side walk; zero data bytes."""
    refs = _ensure_main(table_path, _read_refs(table_path))
    for r in (src, into):
        if r not in refs["branches"]:
            raise ValueError(f"unknown branch {r!r}")
    src_v, into_v = refs["branches"][src], refs["branches"][into]
    log = _read_log(table_path)
    by_v = {e["version"]: e for e in log}
    # Ancestry walk src-head -> parents. Pre-ref (linear) entries have no
    # parent field; their implicit parent is the previous log version.
    v: int | None = src_v
    seen_ancestor = False
    while v is not None:
        if v == into_v:
            seen_ancestor = True
            break
        entry = by_v[v]
        if "parent" in entry:
            v = entry["parent"]
        else:
            prior = [e["version"] for e in log if e["version"] < v]
            v = max(prior) if prior else None
    if not seen_ancestor:
        raise ValueError(
            f"branch {into!r} moved since {src!r} diverged; "
            "non-fast-forward merge requires a rebase"
        )
    version = log[-1]["version"] + 1
    log.append(
        {
            "version": version,
            "ts_ms": int(time.time() * 1000) if ts_ms is None else ts_ms,
            "paths": _entry_paths(by_v[src_v]),
            "parent": into_v,
        }
    )
    _write_log(table_path, log)
    # Only the TARGET pointer advances — git and Nessie both leave the
    # source branch where it was after a merge (round-9 self-review: the
    # first cut moved both, a semantics deviation no oracle could see
    # because no registered query reads the source ref post-merge).
    refs["branches"][into] = version
    _write_refs(table_path, refs)
    return version


def transplant(
    table_path: str, src_version: int, onto: str = "main",
    ts_ms: int | None = None,
) -> int:
    """Nessie ``transplant`` (cherry-pick): apply ONE commit's own delta
    onto another branch without its siblings — the delta is the file-set
    difference against the commit's parent, so the operation is
    metadata-only like every other ref op. Only append-shaped commits
    (those with a recorded parent and a pure-addition file set) are
    transplantable; an overwrite rewrote files, so its 'delta' is not
    well-defined against a different base — raises, which is also
    Nessie's behavior for non-trivially-conflicting transplants."""
    refs = _ensure_main(table_path, _read_refs(table_path))
    if onto not in refs["branches"]:
        raise ValueError(f"unknown branch {onto!r}")
    log = _read_log(table_path)
    by_v = {e["version"]: e for e in log}
    if src_version not in by_v:
        raise ValueError(f"version {src_version} not found")
    src = by_v[src_version]
    if "parent" not in src:
        raise ValueError(
            f"commit v{src_version} has no recorded parent; only "
            "ref-API append commits are transplantable"
        )
    parent_paths = set(_entry_paths(by_v[src["parent"]]))
    src_paths = set(_entry_paths(src))
    if not parent_paths.issubset(src_paths):
        raise ValueError(
            f"commit v{src_version} rewrote files (overwrite); "
            "its delta is undefined against another base"
        )
    delta = [p for p in _entry_paths(src) if p not in parent_paths]
    onto_v = refs["branches"][onto]
    onto_paths = _entry_paths(by_v[onto_v])
    if set(delta) & set(onto_paths):
        raise ValueError("transplant target already contains the delta")
    version = log[-1]["version"] + 1
    log.append(
        {
            "version": version,
            "ts_ms": int(time.time() * 1000) if ts_ms is None else ts_ms,
            "paths": onto_paths + delta,
            "parent": onto_v,
        }
    )
    _write_log(table_path, log)
    refs["branches"][onto] = version
    _write_refs(table_path, refs)
    return version


def delete_branch(table_path: str, name: str) -> None:
    """Nessie ``DROP BRANCH``: the audit-failed half of branch-WAP —
    abandoning a branch is one ref deletion; its commits stay in the
    log (addressable by version for forensics) until snapshot expiry /
    orphan cleanup reclaims them, exactly Nessie's unreachable-commit GC
    story. ``main`` is protected."""
    if name == "main":
        raise ValueError("cannot delete main")
    refs = _read_refs(table_path)
    if name not in refs["branches"]:
        raise ValueError(f"unknown branch {name!r}")
    del refs["branches"][name]
    _write_refs(table_path, refs)


def list_refs(table_path: str) -> dict:
    """Branches and tags with their pinned versions (Nessie's ref
    listing)."""
    return _read_refs(table_path)


def remove_orphan_dirs(
    table_path: str, older_than_ms: int | None = None
) -> list[str]:
    """Iceberg's ``remove_orphan_files`` maintenance procedure: delete
    data directories (``v{N}/`` / ``d{N}/`` layout) that NO snapshot in
    the commit log references — the debris of commits that wrote data but
    died before the log swap (see commit_snapshot's crash note). Pure
    metadata reconciliation: referenced-set from the log, candidate-set
    from a directory listing, difference removed. Returns removed paths.
    At 100 TB the listing is the only cost.

    ``older_than_ms`` is Iceberg's safety window (epoch-ms cutoff):
    directories whose mtime is at or after the cutoff are NOT deleted,
    so a concurrent in-flight commit (data written, log swap pending)
    cannot lose its files. With the default ``None`` there is NO window —
    only safe when called from the single writer with no commit in
    flight (the shape m21 exercises); any concurrent-writer deployment
    must pass a cutoff of now minus several hours, as real Iceberg
    defaults to (``older_than = 3 days``)."""
    import re
    import shutil

    log = _read_log(table_path)
    referenced = {
        os.path.normpath(p) for e in log for p in _entry_paths(e)
    }
    removed = []
    pat = re.compile(r"^[vd]\d+$")
    for name in sorted(os.listdir(table_path)):
        full = os.path.normpath(os.path.join(table_path, name))
        if (
            pat.match(name)
            and os.path.isdir(full)
            and full not in referenced
            and (
                older_than_ms is None
                or os.path.getmtime(full) * 1000 < older_than_ms
            )
        ):
            shutil.rmtree(full)
            removed.append(full)
    return removed


def rollback_to(table_path: str, version: int, ts_ms: int | None = None) -> int:
    """Roll the table back to ``version`` — Iceberg's
    ``rollback_to_snapshot``: a METADATA-ONLY commit whose file set is the
    target snapshot's (no data is read, copied, or deleted; the abandoned
    snapshots stay addressable for time travel until expired). Returns the
    new current version number. O(1) regardless of table size — at 100 TB
    undoing a bad batch is one log append, not a restore job."""
    log = _read_log(table_path)
    matches = [e for e in log if e["version"] == version]
    if not matches:
        raise ValueError(
            f"version {version} not found (have "
            f"{[e['version'] for e in log]})"
        )
    new_version = log[-1]["version"] + 1
    log.append(
        {
            "version": new_version,
            "ts_ms": int(time.time() * 1000) if ts_ms is None else ts_ms,
            "paths": _entry_paths(matches[0]),
        }
    )
    _write_log(table_path, log)
    return new_version


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
    # Delete only data directories no retained snapshot still references —
    # append commits share files across snapshots (Iceberg's
    # remove-orphan-files discipline, not per-snapshot delete).
    still_referenced = {p for e in keep for p in _entry_paths(e)}
    for e in expired:
        for p in _entry_paths(e):
            if p not in still_referenced:
                shutil.rmtree(p, ignore_errors=True)
    return [e["version"] for e in expired]
