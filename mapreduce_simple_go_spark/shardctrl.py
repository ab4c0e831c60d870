"""Shard-controller semantics (reference K4): balanced, minimal-movement
shard placement.

The reference declares (but does not implement) a controller managing a
sequence of configurations that map NSHARDS=10 shards onto replica groups
(/root/reference/src/shardctrler/common.go:21, :25-29; RPC surface
common.go:37-73). Its tests demand that after Join/Leave the shards are
divided "as evenly as possible" with "as few shards as possible" moved.

Spark owns partition placement in this engine (SURVEY K4), so this module
exists as the *control-plane* utility a user of the reference would expect:
pure, deterministic functions over configurations — no RPC, no Raft. The
data-plane analog of key2shard is the `kv_shard_distribution` query
(operators/kv.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

NSHARDS = 10  # shardctrler/common.go:21


def key2shard(key: str) -> int:
    """First-byte shard hash — shardkv/client.go:22-29."""
    return (ord(key[0]) if key else 0) % NSHARDS


@dataclass(frozen=True)
class Config:
    """One configuration: shard -> gid assignment plus group membership.

    gid 0 means unassigned (the reference's convention for the initial
    config — shardctrler/common.go:25-29).
    """

    num: int
    shards: tuple[int, ...] = (0,) * NSHARDS
    groups: dict[int, tuple[str, ...]] = field(default_factory=dict)


def _rebalance(shards: list[int], gids: list[int]) -> list[int]:
    """Even out ``shards`` across ``gids`` moving as few shards as possible.

    Deterministic: overfull groups surrender their highest-numbered shards
    first; orphaned shards are handed out in ascending shard order. Load
    spread after: max-min <= 1.

    Minimality: total movement = orphaned + sum(max(0, load - target)), so
    the base+1 "extra" slots must go to the groups CURRENTLY holding the
    most shards (every extra slot granted to an already-loaded group saves
    one surrender). Ranking by (-current_load, gid) achieves the optimum —
    targets differ by at most 1, so the greedy choice is exact — and keeps
    the assignment deterministic across ties.
    """
    if not gids:
        return [0] * len(shards)
    gids = sorted(gids)
    owned: dict[int, list[int]] = {g: [] for g in gids}
    orphans: list[int] = []
    for sh, g in enumerate(shards):
        if g in owned:
            owned[g].append(sh)
        else:
            orphans.append(sh)
    base, extra = divmod(len(shards), len(gids))
    # extra slots to the most-loaded groups first: minimal movement
    by_load = sorted(gids, key=lambda g: (-len(owned[g]), g))
    target = {g: base + (1 if i < extra else 0) for i, g in enumerate(by_load)}
    for g in gids:
        while len(owned[g]) > target[g]:
            orphans.append(owned[g].pop())  # surrender highest shard number
    orphans.sort()
    for g in gids:
        while len(owned[g]) < target[g] and orphans:
            owned[g].append(orphans.pop(0))
    out = list(shards)
    for g, shs in owned.items():
        for sh in shs:
            out[sh] = g
    return out


class ShardController:
    """In-memory controller: Join/Leave/Move/Query over config history.

    Mirrors the reference RPC surface (shardctrler/common.go:37-73 and
    client.go:31-101) minus the replication layer. Every mutation appends a
    new numbered Config; Query(-1) returns the latest — identical
    observable semantics to the lab's single-client view.
    """

    def __init__(self) -> None:
        self._configs: list[Config] = [Config(num=0)]

    # -- mutations ---------------------------------------------------------

    def join(self, groups: dict[int, list[str]]) -> Config:
        cur = self._configs[-1]
        new_groups = {**cur.groups, **{g: tuple(s) for g, s in groups.items()}}
        shards = _rebalance(list(cur.shards), list(new_groups))
        cfg = Config(cur.num + 1, tuple(shards), new_groups)
        self._configs.append(cfg)
        return cfg

    def leave(self, gids: list[int]) -> Config:
        cur = self._configs[-1]
        new_groups = {g: s for g, s in cur.groups.items() if g not in set(gids)}
        shards = _rebalance(list(cur.shards), list(new_groups))
        cfg = Config(cur.num + 1, tuple(shards), new_groups)
        self._configs.append(cfg)
        return cfg

    def move(self, shard: int, gid: int) -> Config:
        cur = self._configs[-1]
        shards = list(cur.shards)
        shards[shard] = gid
        cfg = Config(cur.num + 1, tuple(shards), dict(cur.groups))
        self._configs.append(cfg)
        return cfg

    # -- queries -----------------------------------------------------------

    def query(self, num: int = -1) -> Config:
        if num == -1 or num >= len(self._configs):
            return self._configs[-1]
        return self._configs[num]
