"""bench.py final-line transport guard (round-13; no Spark needed).

The grading driver records only the LAST 2,000 chars of bench stdout —
BENCH_r11 grew past it and recorded parsed: None.  These tests pin the
round-13 protocol: per-query times keyed by FULL query names (the
optimization-round bench contract forbids renaming existing entries, so
the mid-build alias scheme was reverted), a length-guard ladder that
re-checks AFTER its last step (ADVICE r12), and a loud failure instead
of an unparseable artifact.  Full-resolution timings additionally ride
the meta line (timings_s) in case the ladder coarsens the final line.
"""

from __future__ import annotations

import json

import pytest

import bench


def _core(n_queries: int, name_len: int = 4, t: float = 1.234) -> dict:
    names = [f"{'x' * name_len}{i:03d}" for i in range(n_queries)]
    return {
        "metric": "headline_suite_seconds",
        "value": round(t * n_queries, 3),
        "unit": "sec",
        "queries": {n: t for n in names},
        "sf": 0.1,
        "iters": 3,
        "degraded": [],
        "host_steal_pct": 1.23,
    }


def test_headline_final_line_fits_under_driver_window():
    """The real suite's final line (full query names) must stay inside
    the 1,950-char guard even 2 queries past the current count; the
    ladder may coarsen decimals but the map must survive intact."""
    core = _core(0)
    # 9.876 s/query: an upper bound on realistic per-query magnitudes
    # (the r12 suite max was 10.1 s, median ~2 s)
    core["queries"] = {n: 9.876 for n in bench.HEADLINE + ["future_query_a", "future_query_b"]}
    core["value"] = round(9.876 * (len(bench.HEADLINE) + 2), 3)
    line = bench.final_line(core)
    assert len(line) <= bench.MAX_FINAL_LINE
    parsed = json.loads(line)
    assert len(parsed["queries"]) == len(bench.HEADLINE) + 2
    assert parsed["queries"][bench.HEADLINE[0]] == pytest.approx(9.876, abs=0.05)


def test_guard_coarsens_rounding_before_overflowing():
    # 95 × 11-char names at 3dp exceed the cap; 1dp fits with map intact
    core = _core(95, name_len=8, t=0.123456)
    assert len(json.dumps(core, separators=(",", ":"))) > bench.MAX_FINAL_LINE
    line = bench.final_line(core)
    assert len(line) <= bench.MAX_FINAL_LINE
    parsed = json.loads(line)
    assert parsed["value"] == core["value"]  # suite total keeps resolution
    assert len(parsed["queries"]) == 95


def test_guard_drops_query_map_when_even_integers_overflow():
    """ADVICE r12: the old ladder never re-checked after the 0-decimal
    step — pathological name/count growth could still print an
    over-window line.  Now the map is dropped and flagged instead."""
    core = _core(400, name_len=40, t=123.456)
    line = bench.final_line(core)
    assert len(line) <= bench.MAX_FINAL_LINE
    parsed = json.loads(line)
    assert "queries" not in parsed
    assert parsed["queries_dropped"] is True
    assert parsed["value"] == core["value"]


def test_guard_raises_when_nothing_fits():
    core = _core(3)
    core["degraded"] = ["x" * 4000]  # un-droppable field forces overflow
    with pytest.raises(RuntimeError, match="final line"):
        bench.final_line(core)
