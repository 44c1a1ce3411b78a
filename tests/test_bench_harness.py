"""The bench harness's self-defense machinery (VERDICT r12 item 2).

The mid-run outlier flag compares each timed query against the best
prior reading across every BENCH_r*.json in the repo root. Those
artifacts come in TWO shapes: the JSON line bench.py itself prints
({"queries": {...}, "sf": ...}) and the driver's wrapper around it
({"n": ..., "rc": ..., "tail": ..., "parsed": {<the line>}}). The
repo-root history is all driver-wrapped — reading only the top level
left the standing table empty and the flag permanently dark (found in
r13 when a 3x-inflated reading produced zero flagged_outliers).

r14: the reference excludes pre-r6 artifacts — r1–r5 timed only the
downstream materialize (fn() built outside the clock), so their
readings undercut every build-heavy query by up to 10x and the flag
cried wolf (6 false flags in BENCH_r13, all re-runs confirming the
timed value — VERDICT r13 item 8).
"""

from __future__ import annotations

import importlib.util
import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _bench_module():
    spec = importlib.util.spec_from_file_location("bench_under_test", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_standing_times_read_both_artifact_shapes(tmp_path):
    bench = _bench_module()
    # bare shape (bench.py's own output line)
    (tmp_path / "BENCH_r06.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q_a": 2.0, "q_b": 0.5}})
    )
    # driver-wrapped shape (the repo-root history)
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps(
            {
                "n": 2,
                "rc": 0,
                "sf": 0.1,
                "tail": "…",
                "parsed": {"sf": 0.1, "queries": {"q_a": 1.0, "q_c": 3.0}},
            }
        )
    )
    standing = bench._standing_query_times(0.1, root=tmp_path)
    # min across rounds, across both shapes
    assert standing == {"q_a": 1.0, "q_b": 0.5, "q_c": 3.0}


def test_standing_times_skip_other_sf_and_garbage(tmp_path):
    bench = _bench_module()
    (tmp_path / "BENCH_r06.json").write_text(
        json.dumps({"sf": 1.0, "queries": {"q_a": 9.0}})
    )
    (tmp_path / "BENCH_r07.json").write_text("not json at all")
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"n": 3, "parsed": {"sf": 1.0, "queries": {"q_a": 8.0}}})
    )
    assert bench._standing_query_times(0.1, root=tmp_path) == {}


def test_standing_times_exclude_pre_r6_convention_artifacts(tmp_path):
    """r1–r5 used the materialize-only timing convention; their readings
    must not set the outlier reference (VERDICT r13 item 8)."""
    bench = _bench_module()
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q_a": 0.1}})  # old convention
    )
    (tmp_path / "BENCH_r06.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q_a": 2.0}})
    )
    assert bench._standing_query_times(0.1, root=tmp_path) == {"q_a": 2.0}


def test_standing_times_wrapper_sf_fallback(tmp_path):
    """A wrapper that carries "sf" only at the top level must still
    contribute its parsed queries (ADVICE r13, bench.py)."""
    bench = _bench_module()
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"n": 1, "sf": 0.1, "parsed": {"queries": {"q_a": 4.0}}})
    )
    assert bench._standing_query_times(0.1, root=tmp_path) == {"q_a": 4.0}


def test_repo_root_history_yields_nonempty_standing_table():
    # the real artifacts must parse — this is the regression the fix is
    # for. Skips (rather than fails) when the repo root carries no
    # sf=0.1 r6+ artifacts at all, e.g. after archiving (ADVICE r13).
    bench = _bench_module()
    has_candidates = any(
        (m := re.search(r"BENCH_r0*(\d+)", p.name)) and int(m.group(1)) >= 6
        for p in REPO.glob("BENCH_r*.json")
    )
    if not has_candidates:
        pytest.skip("no r6+ BENCH artifacts in the repo root")
    standing = bench._standing_query_times(0.1)
    assert standing, "driver-wrapped BENCH_r*.json artifacts must be readable"
    assert all(v > 0 for v in standing.values())
