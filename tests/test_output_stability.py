"""Early-exit / output-stability: published output never changes.

Reference analog: test-mr.sh:217-267 — with early_exit.so some reduce tasks
sleep; a sorted snapshot of mr-out* taken when the first worker exits must
equal the final snapshot, proving the engine never exposes output that later
changes. Spark's commit protocol gives the same guarantee with a different
publication event: part files are renamed into place and ``_SUCCESS`` is
written last, so the FIRST moment output is visible (_SUCCESS present) its
sorted contents must already equal the final result.
"""

from __future__ import annotations

import os
import threading
import time

from mapreduce_simple_go_spark.engine import Engine
from mapreduce_simple_go_spark.operators import mapreduce as mr

from .conftest import SF_DIR

STALL_SEC = 1.5


def stalling_wc_map(filename: str, contents: str):
    """wc map where a deterministic subset of tasks stall (early_exit.go:32-40
    analog: some keys sleep while others finish immediately)."""
    if int(filename) % 3 == 0:
        time.sleep(STALL_SEC)
    return mr.wc_map(filename, contents)


def _read_visible(path: str) -> list[str]:
    lines: list[str] = []
    for f in sorted(os.listdir(path)):
        if f.startswith("part-"):
            with open(os.path.join(path, f)) as fh:
                lines.extend(fh.read().splitlines())
    return sorted(lines)


def test_output_visible_atomically_and_stable(spark, tmp_path):
    eng = Engine(spark)
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(60)
        .selectExpr("cast(doc_id as string) filename", "text contents")
        .repartition(6)
    )
    out = str(tmp_path / "mr-out")
    result = eng.map_reduce(docs, stalling_wc_map, mr.wc_reduce, n_reduce=4)

    err: list[BaseException] = []

    def write():
        try:
            eng.save_text_kv(result, out)
        except BaseException as e:  # surface failures in the main thread
            err.append(e)

    t = threading.Thread(target=write)
    start = time.monotonic()
    t.start()

    first_visible: list[str] | None = None
    deadline = start + 180
    while time.monotonic() < deadline:
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            first_visible = _read_visible(out)
            break
        if err:
            raise err[0]
        time.sleep(0.02)
    publish_elapsed = time.monotonic() - start
    t.join(timeout=180)
    assert not err, err
    assert first_visible is not None, "job never published output"

    # Stalled tasks gate publication: output cannot appear before they ran.
    assert publish_elapsed >= STALL_SEC

    final = _read_visible(out)
    assert first_visible == final, "published output changed after publication"

    # And the published result is the correct one (clean differential run).
    expected = sorted(
        f"{k} {v}"
        for k, v in eng.map_reduce(docs, mr.wc_map, mr.wc_reduce, n_reduce=4).collect()
    )
    assert final == expected
