"""README/SURVEY registry blocks must match the live registry.

VERDICT r8 ask #2: hand-maintained query counts drifted two rounds in a
row (257 and 239 vs the registry's actual size). The committed docs now
carry a generated block (tools/gen_registry_table.py) between markers;
this test recomputes it from ``registry.all_queries()`` and fails on any
drift, so adding an operator without regenerating the docs is a red test,
not silent staleness.
"""

from __future__ import annotations

import os
import re

import tools.gen_registry_table as gen

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _committed_block(fname: str) -> str:
    with open(os.path.join(HERE, fname)) as f:
        text = f.read()
    m = re.search(
        re.escape(gen.BEGIN) + r".*?" + re.escape(gen.END), text, re.DOTALL
    )
    assert m, f"{fname}: registry-table markers missing"
    return m.group(0)


def test_readme_and_survey_match_registry():
    want = gen.render_block()
    assert _committed_block("README.md") == want, (
        "README.md registry block is stale — run "
        "`python tools/gen_registry_table.py`"
    )
    assert _committed_block("SURVEY.md") == want, (
        "SURVEY.md registry block is stale — run "
        "`python tools/gen_registry_table.py`"
    )


def test_block_counts_match_registry():
    from apache_iceberg_spark.registry import all_oracles, all_queries

    n = len(all_queries())
    n_oracle = len(all_oracles())
    block = _committed_block("README.md")
    assert f"**{n} registered queries**" in block
    assert f"{n_oracle} oracle-checked" in block
    assert f"+ {n - n_oracle} rows-only" in block
