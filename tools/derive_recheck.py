"""Derive the driver-recheck set MECHANICALLY from the round's diff
(VERDICT r14 ask #2 / "what's wrong" #1: round 14 rewrote a22/a23 and
st30 but none re-entered the driver's sample because the hand-written
RECHECK list in ``__spark_entry__.py`` had gone stale).

Mechanism — function-level, not module-level, so a one-line fix in a
4,000-line operator module doesn't flood the driver's ~50-row sample
and crowd out the oldest-green rotation the VERDICT also asks for:

1. Base commit = the latest driver round-close commit (message
   ``round N: ...``); the diff is base..worktree.
2. Changed top-level functions per changed package file (diff hunk
   new-side line ranges ∩ ast spans of the CURRENT file).
3. A registered query re-enters the recheck set when
   (a) its own implementing function changed, or
   (b) its implementing function's SOURCE references a changed
       function by name (first-order consumers — the m-queries call
       ``merge_into``/``read_pruned``/... inside their bodies, so a
       catalog-layer rewrite mechanically pulls its consumers in).

``tests/test_recheck_policy.py`` pins ``__spark_entry__.RECHECK`` ⊇
this derivation, so a stale hand-list fails the suite instead of
silently shrinking the driver's evidence.

Usage: python tools/derive_recheck.py [base_ref]
Prints one query name per line (sorted); with -v, the reason each
entered.
"""

from __future__ import annotations

import ast
import inspect
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Changed-function names too generic to use as consumer-match probes
#: (they'd match unrelated query sources by coincidence).
_GENERIC = {"main", "plan", "probe", "agg", "row", "deco", "mutate"}


def base_commit() -> str | None:
    """The latest driver round-close commit (``round N: ...``)."""
    try:
        out = subprocess.run(
            ["git", "log", "--grep", r"^round [0-9]\+:", "-1",
             "--format=%H"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
    except (subprocess.CalledProcessError, OSError):
        return None
    return out or None


def base_round(base: str) -> int | None:
    """Round number parsed from the base commit's ``round N: ...``
    message, or None if it isn't a round-close commit.

    The recheck gate filters ``ever_checked`` to CORRECTNESS rounds
    <= this number (VERDICT r15 "what's wrong" #1): the driver drops
    ``CORRECTNESS_r{N+1}.json`` into the worktree BEFORE the next
    round-close commit exists, and counting that file made brand-new
    queries "ever checked" mid-round, reddening a finished round at
    judge time.
    """
    try:
        msg = subprocess.run(
            ["git", "log", "-1", "--format=%s", base],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
    except (subprocess.CalledProcessError, OSError):
        return None
    m = re.match(r"round (\d+):", msg)
    return int(m.group(1)) if m else None


def changed_lines(base: str) -> dict[str, set[int]]:
    """{repo-relative .py path under the package: new-side changed line
    numbers} for base..worktree."""
    out = subprocess.run(
        ["git", "diff", "-U0", base, "--", "apache_iceberg_spark"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    files: dict[str, set[int]] = {}
    cur: set[int] | None = None
    for line in out.splitlines():
        if line.startswith("+++ b/"):
            path = line[6:]
            if path.endswith(".py"):
                cur = files.setdefault(path, set())
            else:
                cur = None
        elif line.startswith("@@") and cur is not None:
            m = re.match(r"@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", line)
            if m:
                start = int(m.group(1))
                n = int(m.group(2)) if m.group(2) is not None else 1
                cur.update(range(start, start + max(n, 1)))
    return files


def toplevel_spans(path: str) -> dict[str, tuple[int, int]]:
    """{top-level def name: (first_line, last_line)} of the CURRENT
    file (deleted-only files are skipped by the caller)."""
    try:
        tree = ast.parse(open(path).read())
    except (OSError, SyntaxError):
        return {}
    spans = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            spans[node.name] = (node.lineno, node.end_lineno)
    return spans


def derive(base: str, verbose: bool = False) -> dict[str, str]:
    """{query_name: reason} for every registered query the diff since
    ``base`` touches, per the module docstring's two rules."""
    from apache_iceberg_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    changed = changed_lines(base)
    changed_funcs: dict[str, set[str]] = {}
    for rel, lines in changed.items():
        full = os.path.join(REPO, rel)
        if not os.path.exists(full):
            continue
        spans = toplevel_spans(full)
        hit = {
            name
            for name, (a, b) in spans.items()
            if any(a <= ln <= b for ln in lines)
        }
        if hit:
            changed_funcs[rel] = hit

    qinfo: dict[str, tuple[str, str, str]] = {}
    for name, q in REGISTRY.items():
        fn = q.spark
        try:
            rel = os.path.relpath(inspect.getsourcefile(fn), REPO)
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        qinfo[name] = (rel, fn.__name__, src)

    out: dict[str, str] = {}
    for rel, funcs in changed_funcs.items():
        for name, (qrel, fname, _src) in qinfo.items():
            if qrel == rel and fname in funcs:
                out.setdefault(name, f"own body changed ({rel})")
    probes = sorted(
        f
        for funcs in changed_funcs.values()
        for f in funcs
        if f not in _GENERIC
    )
    pat = re.compile(
        r"\b(" + "|".join(re.escape(f) for f in probes) + r")\b"
    ) if probes else None
    if pat:
        for name, (_qrel, _fname, src) in qinfo.items():
            if name in out:
                continue
            m = pat.search(src)
            if m:
                out.setdefault(name, f"consumes changed {m.group(1)}()")
    return out


def main() -> None:
    verbose = "-v" in sys.argv
    args = [a for a in sys.argv[1:] if a != "-v"]
    base = args[0] if args else base_commit()
    if base is None:
        print("no round-close base commit found", file=sys.stderr)
        sys.exit(1)
    derived = derive(base, verbose)
    for name in sorted(derived):
        print(f"{name}  # {derived[name]}" if verbose else name)


if __name__ == "__main__":
    main()
