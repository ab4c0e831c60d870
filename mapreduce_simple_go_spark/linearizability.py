"""Linearizability checking for the KV model (reference K6).

A compact Wing–Gong-style checker with the two structural ideas of the
reference's porcupine engine (/root/reference/src/porcupine/checker.go:179-245
and models/kv.go:17-69):

- **partition by key** — get/put/append on different keys commute, so each
  key's sub-history is checked independently (models/kv.go:18-34);
- **memoized DFS** — search states are (frozenset of linearized op ids,
  model state); a visited pair is never re-explored (the bitset + state
  cache in checker.go:203-224).

The KV model matches models/kv.go:40-54: get returns the current value
("" if absent), put overwrites, append concatenates with no delimiter.

This is test infrastructure, not a data operator: it validates concurrent
histories produced by the streaming KV operator (tests/test_linearizability.py)
exactly as the reference uses porcupine to validate its servers.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Op:
    """One client operation with its real-time interval.

    action: 'get' | 'put' | 'append'; ``output`` is meaningful for get.
    call/ret: invocation and response times (any totally ordered numbers).
    """

    op_id: int
    key: str
    action: str
    value: str  # put/append payload ("" for get)
    output: str  # get result ("" for put/append)
    call: float
    ret: float


def _apply(state: str, op: Op) -> tuple[bool, str]:
    """KV model step (models/kv.go:40-54): returns (output_ok, new_state)."""
    if op.action == "get":
        return op.output == state, state
    if op.action == "put":
        return True, op.value
    if op.action == "append":
        return True, state + op.value
    raise ValueError(f"unknown action {op.action!r}")


def _check_one_key(ops: list[Op], init: str = "") -> bool:
    """Memoized DFS over linearizations of one key's history."""
    n = len(ops)
    if n == 0:
        return True
    visited: set[tuple[frozenset[int], str]] = set()

    def dfs(done: frozenset[int], state: str) -> bool:
        if len(done) == n:
            return True
        key = (done, state)
        if key in visited:
            return False
        visited.add(key)
        # an op may linearize next iff no other *pending* op returned
        # before it was even called (real-time order: if ret_a < call_b,
        # a must linearize before b)
        pending = [o for o in ops if o.op_id not in done]
        min_ret = min(o.ret for o in pending)
        for o in pending:
            if o.call > min_ret:
                continue  # some pending op finished before o started
            ok, new_state = _apply(state, o)
            if ok and dfs(done | {o.op_id}, new_state):
                return True
        return False

    return dfs(frozenset(), init)


def check_kv_history(history: list[Op], init: str = "") -> bool:
    """True iff the concurrent history is linearizable under the KV model.

    Partitions by key (commuting sub-histories), then runs the memoized
    DFS per key — the reference's exact decomposition (models/kv.go:18-34).
    """
    by_key: dict[str, list[Op]] = {}
    for op in history:
        by_key.setdefault(op.key, []).append(op)
    return all(_check_one_key(ops, init) for ops in by_key.values())
