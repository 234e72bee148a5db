"""Side-channel collector for per-block partial reductions.

Ray Data's map output is the wrong channel for a scan that must emit
BOTH a full-size transformed block and a kilobyte-size partial
reduction: union-schema rows would pollute every downstream batch.
Instead the scan pushes its partials to this zero-CPU actor, keyed by a
stable identity of the input block, and the driver drains them after
the dataset materializes.

Delivery/dedup contract: the map task ``ray.get``s the ``add`` call, so
a task only completes after its partials are stored; a retried task
overwrites the same key with identical content, which makes duplicate
delivery harmless for every partial kind (counts included — keyed
overwrite, not accumulate).  Block keys come from the sorted block's
(first conv, last conv, num_rows), which are unique across the
range-partitioned blocks of one pass.

At multi-node scale the payloads stay bounded: edge rows are ≤ 2
conversations per block, and cap/count partials are pre-reduced (and
pre-capped per entity) inside the block before the push.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class BlockPartialCollector:
    """kind → block-key → pickled payload bytes.

    CRITICAL: a plasma-promoted actor argument deserializes to Arrow
    tables whose buffers are ZERO-COPY VIEWS over the argument object
    in shared memory; once Ray releases that argument the pages are
    reused and a stored table silently corrupts (observed as
    nondeterministically shrunken aggregates under raylet worker
    churn).  The actor therefore deep-copies every payload into its own
    heap via pickle before storing."""

    def __init__(self):
        self._parts: dict[str, dict[tuple, bytes]] = {}

    def add(self, kind: str, key: tuple, payload) -> bool:
        import pickle
        if not isinstance(payload, bytes):
            payload = pickle.dumps(payload)
        self._parts.setdefault(kind, {})[key] = payload
        return True

    def clear_prefix(self, prefix: str) -> bool:
        """Drop every kind namespaced under a run nonce (pool reuse)."""
        for k in [k for k in self._parts if k.startswith(prefix)]:
            del self._parts[k]
        return True

    def add_many(self, items: list[tuple]) -> bool:
        """items = [(kind, key, payload), ...] — one round trip per
        block.  Payloads arrive PRE-PICKLED from add_many_sharded (the
        deep copy happens in the parallel map tasks), so this actor's
        serialized critical section is a dict insert; un-pickled
        payloads are still deep-copied here (zero-copy-view hazard,
        class docstring)."""
        import pickle
        for kind, key, payload in items:
            if not isinstance(payload, bytes):
                payload = pickle.dumps(payload)
            self._parts.setdefault(kind, {})[key] = payload
        return True

    def tables(self, kind: str) -> list:
        return list(self._parts.get(kind, {}).values())

    def clear(self) -> None:
        self._parts.clear()


def drain_tables(collector, kind: str) -> list:
    """Fetch a kind's payloads (pickled by the actor — see class
    docstring) and deserialize them on the caller."""
    import pickle
    vals = ray.get(collector.tables.remote(kind))
    return [pickle.loads(v) if isinstance(v, bytes) else v
            for v in vals]


# ---- sharding -------------------------------------------------------------
#
# One collector actor is a serialization point at ~10⁵ blocks on a real
# cluster (every block's push is a blocking round-trip) and, in
# driver-boundary mode, holds every edge row.  N collectors keyed by a
# deterministic hash of the block key spread both; delivery/dedup
# semantics are unchanged because a given block key always lands on the
# same shard (retries overwrite the same key on the same actor).

def shard_of(key: tuple, n: int) -> int:
    """Deterministic shard index for a block key.  NOT python hash():
    string hashing is per-process salted (PYTHONHASHSEED), and a
    retried task on another worker must pick the SAME shard."""
    import zlib
    return zlib.crc32(repr(key).encode()) % n


def make_collectors(n: int) -> list:
    """N zero-CPU collector actors (shard with shard_of)."""
    return [BlockPartialCollector.remote() for _ in range(max(1, n))]


# Actor startup is ~0.5-1 s of worker-process boot per shard; a fresh
# pool per run_pipeline call both pays that on every run and leaks the
# previous run's actors.  The pool is cached per driver process and
# runs isolate their entries by prefixing every kind with a per-run
# nonce (cleared via clear_prefix when the run finishes).
_POOL: list | None = None
_POOL_N = 0


def get_collectors(n: int) -> list:
    """Cached pool of N collector shards; recreated if N changes or the
    cached actors died (e.g. ray was restarted in this process)."""
    global _POOL, _POOL_N
    n = max(1, n)
    if _POOL is not None and _POOL_N == n:
        try:
            # liveness-ping EVERY shard: any dead actor (OOM, node
            # loss) must invalidate the whole pool, else every later
            # run fails on add_many/drain to that shard forever
            ray.get([c.tables.remote("__ping__") for c in _POOL])
            return _POOL
        except Exception:
            pass
    _POOL = make_collectors(n)
    _POOL_N = n
    return _POOL


def add_many_sharded(collectors: list, items: list[tuple]):
    """Route each (kind, key, payload) to its key's shard; one blocking
    round-trip per shard touched (callers ray.get the returned refs so
    the task completes only after its partials land).

    Payloads are pickled HERE, in the caller's (parallel) map task, so
    the shard actor's serialized section is a pure dict insert — with
    actor-side pickling the pushes queued behind each other and cost
    ~25% of the decide-phase wall at sf1/32cpu."""
    import pickle
    by_shard: dict[int, list] = {}
    for kind, key, payload in items:
        by_shard.setdefault(shard_of(key, len(collectors)), []).append(
            (kind, key, pickle.dumps(payload)))
    return [collectors[s].add_many.remote(batch)
            for s, batch in by_shard.items()]


def invalidate_pool() -> None:
    """Drop the cached pool so the next get_collectors() recreates it
    (call after a shard actor is observed dead mid-run)."""
    global _POOL, _POOL_N
    _POOL, _POOL_N = None, 0


def drain_tables_sharded(collectors: list, kind: str) -> list:
    """drain_tables across every shard (order is irrelevant: all
    consumers merge/concat the partials)."""
    import pickle
    refs = [c.tables.remote(kind) for c in collectors]
    try:
        got = ray.get(refs)
    except ray.exceptions.RayActorError:
        # a shard died mid-run: poison the cache so the NEXT run gets a
        # fresh pool instead of failing forever, then surface the error
        # (this run's partials are incomplete either way)
        invalidate_pool()
        raise
    out = []
    for vals in got:
        out.extend(pickle.loads(v) if isinstance(v, bytes) else v
                   for v in vals)
    return out


def block_key(t) -> tuple:
    """Stable identity of a sorted block: first/last (conv, turn) plus
    row count.

    The turn indices are LOAD-BEARING: a hot conversation spanning 3+
    blocks makes every middle block consist of that conversation alone,
    so (first_conv, last_conv, nrows) collides between two equal-sized
    middle blocks and one block's partials silently overwrite the
    other's (observed: ~one block of rows vanishing from the assembled
    table whenever sort sampling produced equal-sized middle blocks).
    The (conv, turn) ranges of distinct sorted blocks are disjoint, so
    this key cannot collide."""
    if t.num_rows == 0:
        return ("", -1, "", -1, 0)
    conv = t.column("conv_id")
    turn = t.column("turn_idx")
    n = t.num_rows
    return (str(conv[0]), int(turn[0].as_py()),
            str(conv[n - 1]), int(turn[n - 1].as_py()), n)
