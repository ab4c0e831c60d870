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
  5. sweep completeness    — each self-sweep family's newest artifact must
                             cover every registry name (an incomplete sweep
                             cannot land silently — r12 verdict #3)
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
    exists) — otherwise the 50-slot window rotation fell behind.

    The computation lives in
    ``mapreduce_simple_go_spark.operators.driver_verdict_staleness`` (r12
    verdict #8: the gate and the registry's _WINDOW_PRIORITY rotation must
    share one staleness source, or a drift between the two would let the
    gate check the wrong floor)."""
    sys.path.insert(0, REPO)
    from mapreduce_simple_go_spark.operators import driver_verdict_staleness

    st = driver_verdict_staleness(REPO)
    if st["never"]:
        # brand-new entries legitimately have no verdict yet — they must be
        # IN the priority window, which the driver checks next round; list
        # them informationally, don't fail.
        print(
            f"# window: {len(st['never'])} names await a first driver "
            f"verdict: {st['never']}"
        )
    floor, newest = st["newest"] - 2, st["newest"]
    if st["stale"]:
        print(
            f"== window staleness: FAIL — {len(st['stale'])} names last "
            f"verified before r{floor}: {st['stale']}"
        )
        return False
    print(f"== window staleness: OK (floor r{floor}, newest r{newest})")
    return True


def sweep_completeness() -> bool:
    """The NEWEST round's self-sweep artifacts must cover every registry
    name (r12 verdict #3: CORRECTNESS_SELF_SF01_r12 silently landed with
    142/148 — six names absent, not errored — and nothing caught it).

    For each self-sweep family (CORRECTNESS_SELF, CORRECTNESS_SELF_SF01,
    CORRECTNESS_SELF_SF1, CORRECTNESS_SELF_SF10) the artifact from the
    newest round in that family must contain a key for every name in the
    registry. Missing names fail the gate; a family with no artifacts at
    all is skipped (families appear as rounds add them)."""
    sys.path.insert(0, REPO)
    from mapreduce_simple_go_spark.operators import all_queries

    names = set(all_queries())
    fams = ("CORRECTNESS_SELF", "CORRECTNESS_SELF_SF01",
            "CORRECTNESS_SELF_SF1", "CORRECTNESS_SELF_SF10")
    ok = True
    for fam in fams:
        arts: list[tuple[int, str]] = []
        for p in glob.glob(os.path.join(REPO, f"{fam}_r*.json")):
            m = re.fullmatch(rf"{fam}_r(\d+)\.json", os.path.basename(p))
            if m:
                arts.append((int(m.group(1)), p))
        if not arts:
            continue
        rnd, path = max(arts)
        try:
            with open(path) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            print(f"== sweep completeness: FAIL — {path}: {e}")
            ok = False
            continue
        missing = sorted(names - set(d))
        if missing:
            print(
                f"== sweep completeness: FAIL — {fam}_r{rnd} covers "
                f"{len(set(d) & names)}/{len(names)}; absent: {missing}"
            )
            ok = False
        else:
            print(f"# sweep completeness: {fam}_r{rnd} covers {len(names)}/{len(names)}")
    print(f"== sweep completeness: {'OK' if ok else 'FAIL'}")
    return ok


def main() -> int:
    py = sys.executable
    ok = True
    ok &= _run("bench_diff", [py, "scripts/bench_diff.py"])
    ok &= _run("scaling gate", [py, "scripts/scaling_exponents.py", "--gate"])
    ok &= _run("net probe", [py, "scripts/net_probe.py"], failing_soft=True)
    ok &= window_staleness()
    ok &= sweep_completeness()
    print(f"== round_gate: {'ALL OK' if ok else 'FAILURES ABOVE'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
