"""Pin scripts/bench_diff.py (r10 verdict #7): the driver-artifact diff
must retroactively flag EXACTLY the three r9/r10 repeat offenders, and
must stay quiet on synthetic clean/one-off-noise histories."""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "scripts")
import bench_diff  # noqa: E402


def test_retroactively_flags_exactly_the_three_known_names():
    fams = bench_diff._families(at_round=10)
    flags = []
    for fam, arts in fams.items():
        flags.extend(bench_diff.diff_family(fam, arts))
    flagged = {(f["family"], f["query"]) for f in flags}
    assert flagged == {
        ("BENCH", "ann_ivf_topk"),
        ("BENCH", "word_triangles"),
        ("BENCH", "q8_market_share"),
    }, flagged


def _fake_family(tmp_path, rounds: dict[int, dict[str, float]]):
    arts = []
    for rnd, queries in sorted(rounds.items()):
        p = tmp_path / f"BENCH_r{rnd:02d}.json"
        p.write_text(json.dumps({"sf": 0.1, "queries": queries}))
        arts.append((rnd, str(p)))
    return arts


def test_single_noise_spike_not_flagged(tmp_path):
    arts = _fake_family(
        tmp_path,
        {8: {"q": 1.0}, 9: {"q": 2.0}, 10: {"q": 1.1}},  # one-off spike
    )
    assert bench_diff.diff_family("BENCH", arts) == []


def test_two_consecutive_regressions_flagged(tmp_path):
    arts = _fake_family(
        tmp_path,
        {8: {"q": 1.0}, 9: {"q": 1.4}, 10: {"q": 1.5}},
    )
    flags = bench_diff.diff_family("BENCH", arts)
    assert [f["query"] for f in flags] == ["q"]


def test_tiny_absolute_delta_ignored(tmp_path):
    # 2x ratio but 0.1 s absolute — below the host's measurement floor.
    arts = _fake_family(
        tmp_path,
        {8: {"q": 0.1}, 9: {"q": 0.2}, 10: {"q": 0.2}},
    )
    assert bench_diff.diff_family("BENCH", arts) == []


def test_needs_three_rounds(tmp_path):
    arts = _fake_family(tmp_path, {9: {"q": 1.0}, 10: {"q": 9.0}})
    assert bench_diff.diff_family("BENCH", arts) == []


def test_waiver_clears_matching_flag_only(tmp_path, monkeypatch):
    monkeypatch.setattr(bench_diff, "REPO", str(tmp_path))
    (tmp_path / "scripts").mkdir()
    _fake_family(tmp_path, {8: {"q": 1.0}, 9: {"q": 1.6}, 10: {"q": 1.6}})
    # unwaived -> red
    assert bench_diff.main([]) == 1
    (tmp_path / "scripts" / "bench_waivers.json").write_text(
        json.dumps(
            [
                {
                    "family": "BENCH",
                    "query": "q",
                    "anchor_round": "r8",
                    "reason": "idle-host remeasure at HEAD reads below anchor",
                    "evidence": "SCALE.md r13 exoneration table",
                }
            ]
        )
    )
    # waived -> green
    assert bench_diff.main([]) == 0


def test_waiver_expires_when_anchor_slides(tmp_path, monkeypatch):
    monkeypatch.setattr(bench_diff, "REPO", str(tmp_path))
    (tmp_path / "scripts").mkdir()
    (tmp_path / "scripts" / "bench_waivers.json").write_text(
        json.dumps(
            [
                {
                    "family": "BENCH",
                    "query": "q",
                    "anchor_round": "r8",
                    "reason": "host-load noise",
                    "evidence": "commit abc",
                }
            ]
        )
    )
    # anchor is r9 here, not the waived r8 -> waiver does not match
    _fake_family(
        tmp_path, {9: {"q": 1.0}, 10: {"q": 1.6}, 11: {"q": 1.6}}
    )
    assert bench_diff.main([]) == 1


def test_malformed_waiver_fails_loudly(tmp_path, monkeypatch):
    monkeypatch.setattr(bench_diff, "REPO", str(tmp_path))
    (tmp_path / "scripts").mkdir()
    (tmp_path / "scripts" / "bench_waivers.json").write_text(
        json.dumps([{"family": "BENCH", "query": "q", "anchor_round": "r8",
                     "reason": "  ", "evidence": "x"}])
    )
    _fake_family(tmp_path, {8: {"q": 1.0}, 9: {"q": 1.0}, 10: {"q": 1.0}})
    with pytest.raises(SystemExit):
        bench_diff.main([])


def test_cli_exit_codes(tmp_path, monkeypatch):
    monkeypatch.setattr(bench_diff, "REPO", str(tmp_path))
    _fake_family(
        tmp_path, {8: {"q": 1.0}, 9: {"q": 1.0}, 10: {"q": 1.05}}
    )
    assert bench_diff.main([]) == 0
    _fake_family(
        tmp_path, {8: {"q": 1.0}, 9: {"q": 1.6}, 10: {"q": 1.6}}
    )
    assert bench_diff.main([]) == 1
    with pytest.raises(SystemExit):
        bench_diff.main(["--at", "bogus"])
