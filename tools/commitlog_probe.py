"""Commit-log I/O probe (VERDICT r10 ask #1's done-criterion): measure
per-commit metadata bytes at 10k commits through the REAL commit path
(``_append_commit`` — lock, CAS, segment append), no Spark involved.

Round-10 stored delta entries but rewrote the whole log per commit:
O(commits) bytes per commit, O(commits²) cumulative — 7.47 GB at 10k
commits (SCALE_NOTES §ref-log). Round 11's append-only JSONL segment
writes one entry per commit: O(1) bytes, O(commits) cumulative.

Usage: PYTHONPATH=/root/repo python tools/commitlog_probe.py [n_commits]
Prints one JSON line with measured per-commit bytes (first/median/last),
cumulative bytes written, log size, and wall time — plus the analytic
whole-file-rewrite cumulative for the same history as the comparison.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    from apache_iceberg_spark.catalog.snapshots import (
        _append_commit,
        _read_log,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    table = tempfile.mkdtemp(prefix="logprobe_") + "/t"
    os.makedirs(table)
    seg = os.path.join(table, "_versions.jsonl")

    # st19-shape entries: one 60-byte data path added per commit.
    per_commit_bytes: list[int] = []
    prev_size = 0
    t0 = time.time()
    head = None
    for v in range(1, n + 1):
        path = f"{table}/d{v}-{'x' * max(0, 52 - len(str(v)))}"
        entry = (
            {"version": 1, "ts_ms": v, "path": path, "partition_by": None}
            if v == 1
            else {
                "version": v,
                "ts_ms": v,
                "adds": [path],
                "parent": v - 1,
                "partition_by": None,
            }
        )
        _append_commit(table, entry, expected_head=head)
        head = v
        size = os.path.getsize(seg)
        per_commit_bytes.append(size - prev_size)
        prev_size = size
    wall = time.time() - t0

    # Verify the log still resolves end-to-end after 10k appends.
    log = _read_log(table)
    assert len(log) == n, (len(log), n)

    # The r10 comparison: a whole-file rewrite per commit writes the
    # ENTIRE log each time -> cumulative = sum of prefix sizes. Compute
    # it analytically from the same entry sizes.
    csum = 0
    rewrite_cum = 0
    for b in per_commit_bytes:
        csum += b
        rewrite_cum += csum

    per_sorted = sorted(per_commit_bytes)
    print(
        json.dumps(
            {
                "commits": n,
                "per_commit_bytes_first": per_commit_bytes[0],
                "per_commit_bytes_median": per_sorted[n // 2],
                "per_commit_bytes_last": per_commit_bytes[-1],
                "cumulative_bytes_written": csum,
                "log_size_bytes": os.path.getsize(seg),
                "whole_file_rewrite_cumulative_bytes": rewrite_cum,
                "reduction_factor": round(rewrite_cum / max(1, csum), 1),
                "wall_s": round(wall, 2),
                "commits_per_s": round(n / wall, 1),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
