"""Pin scripts/round_gate.py's repo-side checks (r12 verdict #3/#8):

- sweep_completeness must fail when the newest artifact of any self-sweep
  family is missing registry names (the r12 SF01 artifact landed with
  142/148 silently — this gate makes that impossible), and must ignore
  older incomplete artifacts once a complete newer one exists.
- window_staleness must read from the shared
  operators.driver_verdict_staleness helper (single source of truth with
  the registry's _WINDOW_PRIORITY rotation).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "scripts")
sys.path.insert(0, ".")
import round_gate  # noqa: E402

from mapreduce_simple_go_spark.operators import (  # noqa: E402
    all_queries,
    driver_verdict_staleness,
)


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(json.dumps(payload))


def test_sweep_completeness_flags_missing_names(tmp_path, monkeypatch, capsys):
    names = sorted(all_queries())
    full = {n: {"rows_match": True} for n in names}
    partial = dict(full)
    for n in names[:3]:
        del partial[n]
    _write(tmp_path, "CORRECTNESS_SELF_r12.json", full)
    _write(tmp_path, "CORRECTNESS_SELF_SF01_r12.json", partial)
    monkeypatch.setattr(round_gate, "REPO", str(tmp_path))
    assert round_gate.sweep_completeness() is False
    out = capsys.readouterr().out
    for n in names[:3]:
        assert n in out


def test_sweep_completeness_newest_artifact_wins(tmp_path, monkeypatch):
    names = sorted(all_queries())
    full = {n: {"rows_match": True} for n in names}
    partial = {n: {"rows_match": True} for n in names[5:]}
    # r12 incomplete, r13 complete: only the NEWEST artifact per family
    # is checked, so the hole in history does not fail the gate forever.
    _write(tmp_path, "CORRECTNESS_SELF_SF01_r12.json", partial)
    _write(tmp_path, "CORRECTNESS_SELF_SF01_r13.json", full)
    monkeypatch.setattr(round_gate, "REPO", str(tmp_path))
    assert round_gate.sweep_completeness() is True


def test_sweep_completeness_skips_absent_families(tmp_path, monkeypatch):
    # no artifacts at all -> nothing to check, gate passes
    monkeypatch.setattr(round_gate, "REPO", str(tmp_path))
    assert round_gate.sweep_completeness() is True


def test_staleness_helper_counts_only_green_rows(tmp_path):
    names = sorted(all_queries())
    rows = {n: {"err": None, "rows_match": True} for n in names}
    # one red row in the newest round must NOT refresh its name
    rows[names[0]] = {"err": "boom", "rows_match": False}
    _write(tmp_path, "CORRECTNESS_r13.json", rows)
    green_before = {n: {"err": None, "rows_match": True} for n in names}
    _write(tmp_path, "CORRECTNESS_r10.json", green_before)
    st = driver_verdict_staleness(str(tmp_path))
    assert st["newest"] == 13
    # names[0]'s last green is r10 < floor r11 -> stale
    assert names[0] in st["stale"]
    assert st["never"] == []
    assert st["last_green"][names[1]] == 13


def test_staleness_helper_never_verified(tmp_path):
    _write(
        tmp_path,
        "CORRECTNESS_r13.json",
        {n: {"err": None, "rows_match": True} for n in sorted(all_queries())[1:]},
    )
    st = driver_verdict_staleness(str(tmp_path))
    assert st["never"] == [sorted(all_queries())[0]]
    assert st["stale"] == []


def test_round_gate_window_staleness_uses_shared_helper(tmp_path, monkeypatch):
    # green rows for everything at r13 -> OK regardless of artifact dir
    names = sorted(all_queries())
    _write(
        tmp_path,
        "CORRECTNESS_r13.json",
        {n: {"err": None, "rows_match": True} for n in names},
    )
    monkeypatch.setattr(round_gate, "REPO", str(tmp_path))
    assert round_gate.window_staleness() is True
