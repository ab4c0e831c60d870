#!/usr/bin/env python
"""One-shot round checklist (r11 verdict #8): runs every per-round gate and
exits nonzero if any fails, so the checklist cannot be forgotten piecemeal.

    python scripts/round_gate.py

Gates, in order:
  1. bench_diff            — second-consecutive >1.25x driver-bench regressions
  2. scaling_exponents     — scaling-law regression gate (vs the vetted law)
  3. net_probe             — failing-soft network probe (vendored-protobuf
                             rebuild conditional; never fails the round)
  4. window staleness      — no registry name's last green driver verdict may
                             be older than two rounds behind the newest
                             CORRECTNESS artifact (the rotation contract)
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(label: str, cmd: list[str], failing_soft: bool = False) -> bool:
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    ok = r.returncode == 0
    print(f"== {label}: {'OK' if ok else 'FAIL'}", flush=True)
    return ok or failing_soft


def window_staleness() -> bool:
    """Every registry name's newest green driver verdict must be within two
    rounds of the newest CORRECTNESS round (e.g. nothing r9-stale once r11
    exists) — otherwise the 50-slot window rotation fell behind."""
    last: dict[str, int] = {}
    newest = 0
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, v in d.items():
            if isinstance(v, dict) and v.get("err") is None and v.get("rows_match"):
                last[name] = max(last.get(name, 0), rnd)
    sys.path.insert(0, REPO)
    from mapreduce_simple_go_spark.operators import all_queries

    names = set(all_queries())
    floor = newest - 2
    stale = sorted(
        n for n in names if last.get(n, 0) < floor
    )
    never = sorted(n for n in names if n not in last)
    if never:
        # brand-new entries legitimately have no verdict yet — they must be
        # IN the priority window, which the driver checks next round; list
        # them informationally, don't fail.
        print(f"# window: {len(never)} names await a first driver verdict: {never}")
    stale = [n for n in stale if n in last]
    if stale:
        print(
            f"== window staleness: FAIL — {len(stale)} names last verified "
            f"before r{floor}: {stale}"
        )
        return False
    print(f"== window staleness: OK (floor r{floor}, newest r{newest})")
    return True


def main() -> int:
    py = sys.executable
    ok = True
    ok &= _run("bench_diff", [py, "scripts/bench_diff.py"])
    ok &= _run("scaling gate", [py, "scripts/scaling_exponents.py", "--gate"])
    ok &= _run("net probe", [py, "scripts/net_probe.py"], failing_soft=True)
    ok &= window_staleness()
    print(f"== round_gate: {'ALL OK' if ok else 'FAILURES ABOVE'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
