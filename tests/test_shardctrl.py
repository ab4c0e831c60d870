"""Shard-controller property tests — the reference's `check()` invariants.

The lab's shardctrler tests assert after every Join/Leave: all shards
assigned (when any group exists), load spread max-min <= 1, and minimal
movement between consecutive configs (TestBasic/TestMulti in
/root/reference/src/shardctrler/test_test.go). Hypothesis drives random
Join/Leave sequences through the same invariants.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_simple_go_spark.shardctrl import (
    NSHARDS,
    Config,
    ShardController,
    key2shard,
)


def _check_balanced(cfg: Config):
    if not cfg.groups:
        assert all(g == 0 for g in cfg.shards)
        return
    loads = {g: 0 for g in cfg.groups}
    for g in cfg.shards:
        assert g in cfg.groups, "shard assigned to a non-member group"
        loads[g] += 1
    assert max(loads.values()) - min(loads.values()) <= 1, loads


def _moved(a: Config, b: Config) -> int:
    return sum(1 for x, y in zip(a.shards, b.shards) if x != y)


def _min_possible_moves(before: Config, after: Config) -> int:
    """Theoretical minimum movement to rebalance onto ``after.groups``.

    Computed from the BEFORE config and the new group set only — independent
    of the implementation's target assignment. Any balanced config has
    per-group targets in {base, base+1} with exactly ``extra`` groups at
    base+1; moves = orphans + overflow, and overflow is minimized by giving
    the base+1 slots to the groups currently holding the most shards (only
    the multiset of loads matters, so this bound is assignment-independent).
    """
    gids = sorted(after.groups)
    if not gids:
        return sum(1 for g in before.shards if g != 0)
    base, extra = divmod(NSHARDS, len(gids))
    loads = {g: 0 for g in gids}
    orphaned = 0
    for g in before.shards:
        if g in loads:
            loads[g] += 1
        else:
            orphaned += 1
    desc = sorted(loads.values(), reverse=True)
    overflow = sum(
        max(0, load - (base + 1 if i < extra else base))
        for i, load in enumerate(desc)
    )
    return orphaned + overflow


def test_join_leave_basic_balance_and_minimal_movement():
    c = ShardController()
    cfg1 = c.join({1: ["s1a", "s1b"]})
    assert set(cfg1.shards) == {1}
    cfg2 = c.join({2: ["s2a"]})
    _check_balanced(cfg2)
    # joining one group into a 2-group world moves exactly the shards the
    # new group must own (10 -> 5/5: 5 moves), never more
    assert _moved(cfg1, cfg2) == 5
    cfg3 = c.join({3: ["s3a"]})
    _check_balanced(cfg3)
    # 5/5 -> 4/3/3: exactly 3 shards move to group 3
    assert _moved(cfg2, cfg3) == 3
    cfg4 = c.leave([1])
    _check_balanced(cfg4)
    # only group 1's shards move
    assert _moved(cfg3, cfg4) == sum(1 for g in cfg3.shards if g == 1)


def test_join_into_loaded_world_moves_minimum():
    """Joining gid 1 into {2: 5 shards, 3: 5 shards} must move exactly 3
    shards ({2:4, 3:3, 1:3} is balanced) — not 4, which a load-blind
    extra-slot assignment (lowest gid first) would produce."""
    c = ShardController()
    c.join({2: ["s2"]})
    cfg2 = c.join({3: ["s3"]})
    loads = {g: sum(1 for x in cfg2.shards if x == g) for g in (2, 3)}
    assert loads == {2: 5, 3: 5}
    cfg3 = c.join({1: ["s1"]})
    _check_balanced(cfg3)
    assert _moved(cfg2, cfg3) == 3
    # the already-loaded groups keep their extra slot; the newcomer gets base
    assert sum(1 for x in cfg3.shards if x == 1) == 3


def test_query_history_and_move():
    c = ShardController()
    c.join({1: ["a"]})
    c.join({2: ["b"]})
    cfg = c.move(0, 2)
    assert cfg.shards[0] == 2
    assert c.query(1).num == 1
    assert c.query(-1).num == cfg.num
    assert c.query(0).groups == {}


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("join"), st.integers(min_value=1, max_value=8)),
            st.tuples(st.just("leave"), st.integers(min_value=1, max_value=8)),
        ),
        max_size=12,
    )
)
def test_random_membership_sequences_stay_balanced_and_minimal(opsq):
    c = ShardController()
    alive: set[int] = set()
    for op, gid in opsq:
        before = c.query(-1)
        if op == "join" and gid not in alive:
            cfg = c.join({gid: [f"srv{gid}"]})
            alive.add(gid)
        elif op == "leave" and gid in alive:
            cfg = c.leave([gid])
            alive.discard(gid)
        else:
            continue
        _check_balanced(cfg)
        assert _moved(before, cfg) == _min_possible_moves(before, cfg)


def test_key2shard_matches_reference_function():
    # int(key[0]) % 10 — shardkv/client.go:22-29
    assert key2shard("a") == ord("a") % 10
    assert key2shard("") == 0
    assert key2shard("42") == ord("4") % 10
