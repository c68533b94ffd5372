"""The driver captures a ~2 KB stdout tail and parses the LAST line as the
bench contract object. Round 5 broke this by appending fixture fingerprints
to the final line (BENCH_r05.json recorded ``parsed: null``). These tests
pin the contract so it cannot silently regress again."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

# The driver's tail capture observed in BENCH_r0{3,4,5}.json is 2000 chars.
# The final (contract) line must fit with a little headroom; the preceding
# digest/streaming lines are best-effort (BENCH_r11's capture already cut
# into the streaming line — both also go to stderr), so since round 12 the
# headroom is small and the contract line carries the host self-label.
_TAIL_BUDGET = 2000
_PRECEDING_LINES_BUDGET = 100  # r13: 50 chars traded for aux/stream totals


def _rendered_contract_line(timings: dict) -> str:
    return json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 99999.999,
            "unit": "sec",
            "queries": timings,
            "canary_total": 99999.999,
            "aux_total": 99999.999,
            # worst-case aux_top5: five longest registered AUX names at
            # pathological widths (VERDICT r13 ask #4)
            "aux_top5": {
                # emission is 1-decimal; worst case is 4 digits + .9
                name: 1234.5
                for name in sorted(bench.AUX, key=len, reverse=True)[:5]
            },
            "stream_total": 99999.999,
            # worst-case stream_top5 (VERDICT r14 ask #3): five longest
            # registered STREAMING names at pathological widths
            "stream_top5": {
                name: 1234.5
                for name in sorted(bench.STREAMING, key=len, reverse=True)[:5]
            },
            "sf": 0.1,
            # worst-case-width host self-label (VERDICT r11 ask #2)
            "host": {
                "load1_start": 999.99,
                "load1_end": 999.99,
                "cpus_visible": 128,
            },
        },
        separators=(",", ":"),
    )


def _spill(timings: dict) -> tuple[dict, dict]:
    """Mirror bench.main()'s overflow guard."""
    kept = dict(timings)
    overflow: dict = {}
    while len(_rendered_contract_line(kept)) > bench.CONTRACT_LINE_BUDGET and kept:
        name, val = kept.popitem()
        overflow[name] = val
    return kept, overflow


def test_budget_leaves_room_for_digest_lines():
    assert bench.CONTRACT_LINE_BUDGET + _PRECEDING_LINES_BUDGET <= _TAIL_BUDGET


def test_guard_bounds_final_line_even_at_worst_case_widths():
    # Pathological widths: 4-digit seconds with 3 decimals per query.
    kept, overflow = _spill({name: 1234.567 for name in bench.HEADLINE})
    assert len(_rendered_contract_line(kept)) <= bench.CONTRACT_LINE_BUDGET
    assert set(kept) | set(overflow) == set(bench.HEADLINE)


def test_realistic_widths_spill_nothing():
    # At sf0.1 every headline query runs in single-digit seconds (r5 max:
    # pp10 at 2.705); the contract line must then carry the FULL set so
    # round-over-round per-query comparison needs no overflow stitching.
    # Widths are 2-decimal since round 7 (bench.main rounds the contract
    # timings; full precision lives on stderr).
    kept, overflow = _spill({name: 9.99 for name in bench.HEADLINE})
    assert not overflow, (
        f"{len(overflow)} queries spill at realistic widths — trim HEADLINE"
    )


def test_contract_line_has_exactly_the_contract_keys():
    obj = json.loads(_rendered_contract_line({"q1": 1.0}))
    assert set(obj) == {
        "metric", "value", "unit", "queries", "canary_total",
        "aux_total", "aux_top5", "stream_total", "stream_top5", "sf",
        "host",
    }
    # the self-label the driver's truncated tail must still carry
    assert set(obj["host"]) == {"load1_start", "load1_end", "cpus_visible"}


def test_contract_line_source_carries_aux_total():
    """VERDICT r12 ask #2: the AUX/streaming families' totals must ride
    the final self-labeling line the driver always captures — pin at the
    source so a refactor cannot drop them back to stderr-only."""
    import inspect

    src = inspect.getsource(bench.main)
    start = src.index("def contract_line")
    body = src[start:src.index("# Hard guard on the tail budget")]
    assert '"aux_total"' in body
    assert '"aux_top5"' in body
    assert '"stream_total"' in body
    assert '"stream_top5"' in body


def test_pretouch_reads_every_fixture(tmp_path):
    """VERDICT r12 ask #5: the pre-touch must walk every parquet in the
    sf dir (a partial touch would silently leave cold files and the ±6 s
    noise band)."""
    for name in ("a.parquet", "b.parquet"):
        (tmp_path / name).write_bytes(b"x" * 1024)
    bench.pretouch_fixtures(str(tmp_path))  # must not raise; reads all


def test_contract_line_source_carries_host_self_label():
    """bench.main()'s contract_line must embed the host dict — pin it at
    the source so a refactor cannot silently drop the self-label back to
    the front-truncated separate line (VERDICT r11 ask #2)."""
    import inspect

    src = inspect.getsource(bench.main)
    start = src.index("def contract_line")
    body = src[start:src.index("# Hard guard on the tail budget")]
    for key in ('"host"', '"load1_start"', '"load1_end"', '"cpus_visible"'):
        assert key in body, f"{key} missing from contract_line"


def test_canary_set_is_pinned():
    """The canary's whole point (VERDICT r8 ask #3) is a protocol that
    NEVER changes: 20 queries, frozen membership. Any edit to the set is
    a deliberate protocol break that must also update this hash."""
    import hashlib

    assert len(bench.CANARY) == 20
    digest = hashlib.md5("|".join(bench.CANARY).encode()).hexdigest()
    assert digest == "8fc1aed8c2c18b9bca6e05f02ac825f0", (
        "CANARY membership/order changed — this breaks round-over-round "
        "canary comparability; revert unless the protocol break is "
        "deliberate and documented in README"
    )


def test_canary_queries_are_registered():
    from apache_iceberg_spark.registry import all_queries

    q = all_queries()
    missing = [n for n in bench.CANARY if n not in q]
    assert not missing, f"canary names not in registry: {missing}"


def test_headline_and_streaming_are_registered():
    from apache_iceberg_spark.registry import all_queries

    q = all_queries()
    missing = [
        n
        for n in bench.HEADLINE + bench.STREAMING + bench.AUX
        if n not in q
    ]
    assert not missing, f"bench names not in registry: {missing}"


def test_host_conditions_fields_pinned():
    """VERDICT r10 ask #6: every bench run must self-label its host
    state so a polluted run (like the committed BENCH_r10.json) is
    distinguishable from a code regression without a judge rerun."""
    import bench

    h = bench.host_conditions()
    assert set(h) >= {"cpus_visible", "load1"}
    assert isinstance(h["cpus_visible"], int) and h["cpus_visible"] > 0
    assert h["load1"] is None or h["load1"] >= 0.0
    # the sf0.1 fixture exists on this host, so the cache probe runs
    assert "fixture_read_gbps" in h and h["fixture_read_gbps"] > 0
    assert isinstance(h["fixture_page_cached"], bool)
