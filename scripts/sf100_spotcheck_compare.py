#!/usr/bin/env python
"""Compare the r12 sf100 spot-check sweep against the vetted scaling law
(r10 verdict #5 / r11 verdict #2): for each measured family, the
sf10 -> sf100 decade exponent must sit within ±0.1 of the law's
sf1 -> sf10 last-decade exponent, else the divergence is named.

Usage: python scripts/sf100_spotcheck_compare.py [sf100_spotcheck.json]
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOL = 0.1


def main() -> int:
    sweep_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "sf100_spotcheck.json"
    )
    with open(sweep_path) as f:
        sweep = json.load(f)
    with open(os.path.join(REPO, "scaling_law_vetted.json")) as f:
        law = {r["query"]: r for r in json.load(f)["rows"]}
    rows = sweep["queries"] if isinstance(sweep.get("queries"), dict) else sweep
    ok = True
    for name, r in rows.items():
        if name not in law:
            print(f"{name}: not in vetted law — skipping")
            continue
        lrow = law[name]
        law_exp = math.log10(lrow["last_decade"])
        t_small, t_big = r["t_small"], r["t_big"]
        meas_exp = math.log10(t_big / t_small)
        verdict = "OK" if abs(meas_exp - law_exp) <= TOL else (
            "BELOW-LAW (faster than predicted)" if meas_exp < law_exp else "DIVERGES"
        )
        if verdict == "DIVERGES":
            ok = False
        print(
            f"{name}: sf10={t_small}s sf100={t_big}s ratio={t_big / t_small:.2f} "
            f"exp={meas_exp:.2f} law_last_decade_exp={law_exp:.2f} -> {verdict}"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
