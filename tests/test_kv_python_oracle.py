"""KV replay vs a trivial single-threaded dict replay (FIXTURES.md §2).

The DuckDB oracle proves SQL-equivalence; this proves both agree with the
reference's actual semantics (models/kv.go:40-54) executed the obvious way:
one dict, ops in seq order — get returns current ("" if absent), put
overwrites, append concatenates with no delimiter.
"""

from __future__ import annotations

from mapreduce_simple_go_spark.operators.kv import (
    kv_final_state,
    kv_get_visible,
    kv_ops,
)

from .conftest import SF_DIR


def python_replay(rows):
    state: dict[str, str] = {}
    visible = []
    for seq, key, op, value in sorted(rows):
        if op == "put":
            state[key] = value
        elif op == "append":
            state[key] = state.get(key, "") + value
        else:
            visible.append((seq, key, state.get(key, "")))
    return state, visible


def test_kv_folds_match_dict_replay(spark):
    rows = [
        (r.seq, r.key, r.op, r.value) for r in kv_ops(spark, SF_DIR).collect()
    ]
    want_state, want_visible = python_replay(rows)

    got_state = {r.key: r.state for r in kv_final_state(spark, SF_DIR).collect()}
    # keys with no writes never appear in the Spark fold; drop empty entries
    want_state = {k: v for k, v in want_state.items() if True}
    assert got_state == want_state

    got_visible = sorted(
        (r.seq, r.key, r.visible) for r in kv_get_visible(spark, SF_DIR).collect()
    )
    assert got_visible == sorted(want_visible)
