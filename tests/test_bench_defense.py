"""Unit tests for bench.py's noise defense (r10, per r9 verdict #2).

The defense decides what lands in the OFFICIAL per-round artifact, so its
selection logic is pinned: prior = elementwise min over the two newest
same-SF driver artifacts (driver-wrapped or flat), and a query re-measures
only when BOTH the ratio (>1.25x) and the absolute floor (>0.3 s) trip.
No Spark needed — pure artifact-shape logic.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(REPO, "bench.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_prior_numbers_elementwise_min_and_sf_filter(tmp_path, monkeypatch):
    b = _load_bench()
    # two driver-wrapped artifacts + one flat, mixed SFs
    a8 = {"parsed": {"sf": 0.1, "queries": {"q": 1.0, "only8": 2.0}}}
    a9 = {"parsed": {"sf": 0.1, "queries": {"q": 1.5, "only9": 0.4}}}
    sf1 = {"sf": 1.0, "queries": {"q": 9.0}}
    (tmp_path / "BENCH_r08.json").write_text(json.dumps(a8))
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(a9))
    (tmp_path / "BENCH_SF1_r09.json").write_text(json.dumps(sf1))
    monkeypatch.setattr(b, "REPO", str(tmp_path))
    p = b._prior_numbers(0.1)
    assert p == {"q": 1.0, "only8": 2.0, "only9": 0.4}
    assert b._prior_numbers(1.0) == {"q": 9.0}
    # an unparseable artifact is skipped, not fatal
    (tmp_path / "BENCH_r10.json").write_text("{not json")
    assert b._prior_numbers(0.1)["q"] == 1.0


def test_prior_numbers_uses_only_two_newest(tmp_path, monkeypatch):
    """An ancient lucky reading must roll out of the prior window."""
    b = _load_bench()
    for rnd, val in [("01", 0.1), ("08", 1.0), ("09", 1.2)]:
        (tmp_path / f"BENCH_r{rnd}.json").write_text(
            json.dumps({"sf": 0.1, "queries": {"q": val}})
        )
    monkeypatch.setattr(b, "REPO", str(tmp_path))
    assert b._prior_numbers(0.1)["q"] == 1.0  # min(r08, r09), r01 ignored


def test_remeasure_flag_rule():
    """Both conditions must trip: ratio AND absolute floor."""
    b = _load_bench()
    prior = {"small": 0.1, "big": 4.0, "mid": 1.0}
    timings = {
        "small": 0.2,   # 2x but only +0.1s -> floor blocks
        "big": 4.6,     # +0.6s but 1.15x -> ratio blocks
        "mid": 1.4,     # 1.4x and +0.4s -> flags
        "new": 9.9,     # no prior -> never flags
    }
    flagged = [
        n
        for n, t in timings.items()
        if n in prior
        and t > prior[n] * b._REMEASURE_RATIO
        and t - prior[n] > b._REMEASURE_FLOOR_S
    ]
    assert flagged == ["mid"]


def test_one_query_mode_writes_result(tmp_path):
    """`bench.py --one NAME --out P` runs one query in a fresh session and
    writes {query, sec, rows} — the re-measure subprocess contract."""
    import subprocess

    out = tmp_path / "one.json"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--one",
            "wc",
            "--out",
            str(out),
        ],
        env={
            **os.environ,
            "SPARK_GRAFT_SF_DIR": os.environ.get(
                "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
            ),
            "SPARK_GRAFT_BENCH_PASSES": "1",
        },
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-500:]
    got = json.loads(out.read_text())
    assert got["query"] == "wc" and got["rows"] > 0 and got["sec"] > 0
