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
    """kind → block-key → payload.

    Payloads may be ObjectRefs (the pushing task ``ray.put``s into its
    local plasma store and ships only the ref) so the actor never
    serializes large table bytes; drain with ``drain_tables``."""

    def __init__(self):
        self._parts: dict[str, dict[tuple, object]] = {}

    def add(self, kind: str, key: tuple, payload) -> bool:
        self._parts.setdefault(kind, {})[key] = payload
        return True

    def add_many(self, items: list[tuple]) -> bool:
        """items = [(kind, key, payload), ...] — one round trip per block."""
        for kind, key, payload in items:
            self._parts.setdefault(kind, {})[key] = payload
        return True

    def tables(self, kind: str) -> list:
        return list(self._parts.get(kind, {}).values())

    def clear(self) -> None:
        self._parts.clear()


def drain_tables(collector, kind: str) -> list:
    """Fetch a kind's payloads, resolving ObjectRef payloads in one
    batched ray.get."""
    vals = ray.get(collector.tables.remote(kind))
    refs = [v for v in vals if isinstance(v, ray.ObjectRef)]
    plain = [v for v in vals if not isinstance(v, ray.ObjectRef)]
    return plain + (ray.get(refs) if refs else [])


def block_key(t) -> tuple:
    """Stable identity of a sorted block: (first conv, last conv, rows)."""
    if t.num_rows == 0:
        return ("", "", 0)
    conv = t.column("conv_id")
    return (str(conv[0]), str(conv[t.num_rows - 1]), t.num_rows)
