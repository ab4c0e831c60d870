"""Merge per-entry rows from a partial self_correctness run into a full
artifact (the --only resume/update workflow).

Usage: python scripts/merge_correctness.py TARGET.json PATCH.json
Rows in PATCH replace same-named rows in TARGET (in place).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    target, patch = sys.argv[1], sys.argv[2]
    with open(target) as f:
        base = json.load(f)
    with open(patch) as f:
        upd = json.load(f)
    base.update(upd)
    with open(target, "w") as f:
        json.dump(base, f, indent=2)
    green = sum(
        1
        for r in base.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"]
    )
    print(f"merged {len(upd)} rows -> {target}: {green}/{len(base)} green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
