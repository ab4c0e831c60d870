#!/usr/bin/env python
"""Round-over-round diff of the DRIVER's bench artifacts (r10 verdict #7).

The repo's own bench.py noise-defends its numbers with an isolated
re-measure trail, but the official record is the DRIVER's BENCH_r*.json —
written by a harness bench.py never sees. The r8->r9->r10 drift on
ann_ivf_topk / word_triangles / q8_market_share went unflagged for two
rounds because nothing diffed those artifacts. This script is that diff.

Rule (the r9 verdict's own): a query is FLAGGED when it exceeds
1.25x its anchor number in the two newest artifacts CONSECUTIVELY —
anchor = the artifact two rounds back (the last record the noise
explanation could still cover). One inflated reading is noise; two in a
row against the same anchor is a regression that must be bisected or
documented.

"Documented" is machine-checked (r12 verdict #1: the r12 round closed
with 8 flags neither bisected nor documented per entry — a red gate that
ships silently defeats its purpose): scripts/bench_waivers.json holds
per-entry waivers, each binding EXACTLY one (family, query, anchor_round)
triple with a non-empty reason and evidence pointer (a commit, a SCALE.md
section, or a recorded measurement). A waived flag prints but does not
fail the gate. Binding to the anchor round makes waivers self-expiring:
the moment a new artifact lands and the anchor slides, the waiver stops
matching and the entry must either be clean against the new anchor or be
re-justified — a waiver can never become a standing exemption.

Usage:
    python scripts/bench_diff.py            # check every artifact family
    python scripts/bench_diff.py --at r10   # as-of a given round (CI replay)

Exit 1 iff any query is flagged. Wired into the round checklist next to
`scripts/scaling_exponents.py --gate`.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 1.25
# Queries slower than the anchor by a big RATIO but a tiny ABSOLUTE delta
# are not actionable: this host shows 2-10x transient per-query jitter and
# sub-0.2 s deltas are below its measurement floor.
MIN_ABS_DELTA_S = 0.2


def _queries(path: str) -> dict[str, float]:
    with open(path) as f:
        art = json.load(f)
    if "parsed" in art and isinstance(art["parsed"], dict):
        art = art["parsed"]
    return {k: float(v) for k, v in (art.get("queries") or {}).items()}


def _families(at_round: int | None) -> dict[str, list[tuple[int, str]]]:
    """Artifact files grouped by prefix family (BENCH, BENCH_SF1, ...),
    each family's list sorted by round number ascending."""
    fams: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for p in glob.glob(os.path.join(REPO, "BENCH*_r*.json")):
        m = re.search(r"^(.*)_r(\d+)\.json$", os.path.basename(p))
        if not m:
            continue
        rnd = int(m.group(2))
        if at_round is not None and rnd > at_round:
            continue
        fams[m.group(1)].append((rnd, p))
    return {k: sorted(v) for k, v in fams.items()}


def diff_family(name: str, arts: list[tuple[int, str]]) -> list[dict]:
    """Flags for one artifact family: needs >= 3 rounds (anchor + 2)."""
    if len(arts) < 3:
        return []
    (ra, pa), (rb, pb), (rc, pc) = arts[-3], arts[-2], arts[-1]
    qa, qb, qc = _queries(pa), _queries(pb), _queries(pc)
    flags = []
    for q in sorted(set(qa) & set(qb) & set(qc)):
        anchor = qa[q]
        if anchor <= 0:
            continue
        rb_ratio, rc_ratio = qb[q] / anchor, qc[q] / anchor
        if (
            rb_ratio > THRESHOLD
            and rc_ratio > THRESHOLD
            and qb[q] - anchor >= MIN_ABS_DELTA_S
            and qc[q] - anchor >= MIN_ABS_DELTA_S
        ):
            flags.append(
                {
                    "family": name,
                    "query": q,
                    "anchor_round": f"r{ra}",
                    "anchor_s": anchor,
                    f"r{rb}_s": qb[q],
                    f"r{rc}_s": qc[q],
                    "ratios": [round(rb_ratio, 2), round(rc_ratio, 2)],
                }
            )
    return flags


def _load_waivers() -> dict[tuple[str, str, str], dict]:
    """scripts/bench_waivers.json -> {(family, query, anchor_round): waiver}.

    A malformed file or entry fails LOUDLY (the gate must not silently
    accept a broken waiver as documentation); an absent file is simply no
    waivers."""
    path = os.path.join(REPO, "scripts", "bench_waivers.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        entries = json.load(f)
    out: dict[tuple[str, str, str], dict] = {}
    for e in entries:
        for field in ("family", "query", "anchor_round", "reason", "evidence"):
            if not isinstance(e.get(field), str) or not e[field].strip():
                raise SystemExit(
                    f"bench_waivers.json: entry {e!r} missing/empty {field!r}"
                )
        out[(e["family"], e["query"], e["anchor_round"])] = e
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--at",
        metavar="rN",
        help="replay the check as of round N (ignore newer artifacts)",
    )
    args = ap.parse_args(argv)
    at_round = None
    if args.at:
        m = re.fullmatch(r"r?(\d+)", args.at)
        if not m:
            ap.error(f"--at wants rN or N, got {args.at!r}")
        at_round = int(m.group(1))

    all_flags: list[dict] = []
    for fam, arts in _families(at_round).items():
        all_flags.extend(diff_family(fam, arts))

    waivers = _load_waivers()
    live, waived = [], []
    for f in all_flags:
        w = waivers.get((f["family"], f["query"], f["anchor_round"]))
        (waived if w is not None else live).append((f, w))

    for f, w in waived:
        print(
            f"# waived: {f['family']}/{f['query']} vs {f['anchor_round']} "
            f"(ratios {f['ratios']}) — {w['reason']} [{w['evidence']}]"
        )
    if live:
        print(
            f"bench_diff: {len(live)} second-consecutive >"
            f"{THRESHOLD}x entr{'y' if len(live) == 1 else 'ies'} — "
            "bisect or document (scripts/bench_waivers.json) before the "
            "round closes:"
        )
        for f, _ in live:
            print("  " + json.dumps(f))
        return 1
    print(
        "bench_diff: clean — no unwaived second-consecutive regressions"
        + (f" ({len(waived)} waived above)." if waived else ".")
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
