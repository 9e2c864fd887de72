"""The measurement tooling itself under test (VERDICT r11's "tools under
test" thread): ``tools/floor_audit.py`` (cross-round floor-rule audit,
new in r12) and ``tools/compare_bench.py``'s CI gate, including the GONE
alert the r11 advisor asked for. Both are pure-Python over bench detail
JSON — no Spark session, so this module is cheap."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, TOOLS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _detail(samples, drift=1.0, fresh=None):
    d = {"samples": samples, "anchors": {"drift": drift}}
    if fresh:
        d["fresh_floors"] = {
            q: {"samples": [f], "floor": f} for q, f in fresh.items()
        }
    return {"detail": d}


@pytest.fixture()
def rounds(tmp_path):
    """Two synthetic rounds: q_flat unchanged, q_breach 1.5x slower,
    q_gone missing from the new round, q_fresh tracked fresh-to-fresh."""
    old = tmp_path / "old"
    new = tmp_path / "new"
    old.mkdir(), new.mkdir()
    (old / "d1.json").write_text(json.dumps(_detail(
        {"q_flat": [2.4, 2.0], "q_breach": [2.2, 2.0], "q_gone": [1.0]},
        fresh={"q_fresh": 1.5})))
    (old / "d2.json").write_text(json.dumps(_detail(
        {"q_flat": [1.9, 2.5], "q_breach": [2.5]},
        fresh={"q_fresh": 1.2})))
    (new / "d1.json").write_text(json.dumps(_detail(
        {"q_flat": [2.1, 1.95], "q_breach": [3.4, 3.0]},
        fresh={"q_fresh": 1.3})))
    return str(old / "d*.json"), str(new / "d*.json")


class TestFloorAudit:
    def test_warm_floor_is_min_over_runs_and_samples(self, rounds):
        fa = _load("floor_audit")
        warm, fresh, n = fa.load_round(rounds[0])
        assert n == 2
        assert warm["q_flat"] == 1.9       # min across both files
        assert warm["q_breach"] == 2.0
        assert fresh["q_fresh"] == 1.2

    def test_drift_normalization_divides(self, tmp_path):
        fa = _load("floor_audit")
        p = tmp_path / "d.json"
        p.write_text(json.dumps(_detail({"q": [3.0]}, drift=1.5)))
        raw, _, _ = fa.load_round(str(p))
        norm, _, _ = fa.load_round(str(p), normalize=True)
        assert raw["q"] == 3.0 and norm["q"] == pytest.approx(2.0)

    def test_breach_and_gone_reported(self, rounds, capsys):
        fa = _load("floor_audit")
        rc = fa.main([rounds[0], rounds[1]])
        out = capsys.readouterr().out
        assert rc == 0
        # q_breach: 3.0 / 2.0 = 1.5x > 1.25 rule -> flagged; q_flat is not
        assert "1 warm-floor breach(es): ['q_breach']" in out
        assert "BREACH" in out and "q_flat" in out
        # a row that vanished must be surfaced, not silently dropped
        assert "GONE from new round" in out and "q_gone" in out
        # fresh floors compare like-vs-like: 1.3 / 1.2 is under the rule
        assert "fresh-session floors" in out

    def test_rule_is_configurable(self, rounds, capsys):
        fa = _load("floor_audit")
        fa.main([rounds[0], rounds[1], "--rule", "1.6"])
        out = capsys.readouterr().out
        assert "0 warm-floor breach(es)" in out


class TestCompareBenchGate:
    def _runfiles(self, tmp_path, new_queries):
        old = tmp_path / "old.json"
        new = tmp_path / "new.json"
        old.write_text(json.dumps(
            {"queries_normalized": {"q_ok": 1.0, "q_gone": 1.0}}))
        new.write_text(json.dumps({"queries_normalized": new_queries}))
        return str(old), str(new)

    def test_gate_passes_within_threshold(self, tmp_path, capsys):
        cb = _load("compare_bench")
        old, new = self._runfiles(tmp_path, {"q_ok": 1.2, "q_gone": 1.0})
        assert cb.main([old, new, "--gate", "1.5"]) == 0

    def test_gate_fails_on_slow_row(self, tmp_path, capsys):
        cb = _load("compare_bench")
        old, new = self._runfiles(tmp_path, {"q_ok": 1.8, "q_gone": 1.0})
        assert cb.main([old, new, "--gate", "1.5"]) == 1
        assert "ALERT q_ok" in capsys.readouterr().out

    def test_gone_row_alerts_under_gate(self, tmp_path, capsys):
        # r11 advisor: a query that errored out of the new run must not
        # read as green just because there is no timing to compare.
        cb = _load("compare_bench")
        old, new = self._runfiles(tmp_path, {"q_ok": 1.0})
        assert cb.main([old, new, "--gate", "1.5"]) == 1
        assert "GONE from new run" in capsys.readouterr().out

    def test_allow_gone_optout(self, tmp_path, capsys):
        cb = _load("compare_bench")
        old, new = self._runfiles(tmp_path, {"q_ok": 1.0})
        assert cb.main([old, new, "--gate", "1.5", "--allow-gone"]) == 0
