"""Pin the RECHECK policy (VERDICT r14 ask #2): the driver-sample
recheck set in ``__spark_entry__.py`` must contain every registered
query the round's diff touches — derived MECHANICALLY by
``tools/derive_recheck.py`` (changed top-level functions since the
last driver round-close commit → queries whose own body changed or
whose source consumes a changed function). Round 14's hand-written
list went stale (a22/a23/st30 were rewritten but never re-entered the
sample); with this test a stale list fails the suite instead of
silently shrinking the driver's evidence.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_recheck_superset_of_diff_derivation():
    import derive_recheck

    base = derive_recheck.base_commit()
    if base is None:
        pytest.skip("no driver round-close commit in history")
    derived = derive_recheck.derive(base)

    import __spark_entry__ as entry

    # Never-driver-checked queries (brand-new operators) already lead
    # the coverage order ahead of every RECHECK row — RECHECK is the
    # re-proof list for queries with a PRIOR green to invalidate.
    # ``ever_checked`` counts only CORRECTNESS rounds <= the diff-base
    # round (VERDICT r15 "what's wrong" #1): the driver writes the
    # CURRENT round's CORRECTNESS file into the worktree mid-round,
    # before any round-close commit, and counting it made the round's
    # own brand-new queries "ever checked" — reddening the suite at
    # judge time on a finished round.
    import glob
    import json

    bround = derive_recheck.base_round(base)
    ever_checked: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        fname = os.path.basename(path)
        try:
            rnd = int(fname[len("CORRECTNESS_r"):-len(".json")])
        except ValueError:
            rnd = 0
        if bround is not None and rnd > bround:
            continue
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        ever_checked.update(
            name for name, res in rows.items() if isinstance(res, dict)
        )
    missing = sorted(
        (set(derived) & ever_checked) - set(entry.RECHECK)
    )
    assert not missing, (
        "queries the round's diff touches are absent from RECHECK "
        f"(regenerate with tools/derive_recheck.py): "
        f"{[(m, derived[m]) for m in missing]}"
    )


def test_recheck_names_are_registered():
    """A renamed/dropped query must not squat in RECHECK (it would
    silently burn a recheck slot the driver can't use)."""
    import __spark_entry__ as entry
    from apache_iceberg_spark.registry import all_queries

    unknown = sorted(set(entry.RECHECK) - set(all_queries()))
    assert not unknown, f"RECHECK names not in the registry: {unknown}"


def test_recheck_rows_lead_the_green_tail():
    """The coverage order must put RECHECK rows ahead of every
    already-green query so the driver's prefix sample actually
    re-proves them."""
    import __spark_entry__ as entry

    order = list(entry.queries())
    greens, _red = entry._prior_rounds()
    recheck_pos = [order.index(n) for n in entry.RECHECK if n in order]
    plain_green = [
        order.index(n)
        for n in order
        if n in greens and n not in entry.RECHECK
    ]
    if recheck_pos and plain_green:
        assert max(recheck_pos) < min(plain_green)
