"""Incremental dedup index — the one place the Dataset API genuinely
can't express the semantics and raw Ray actors are the right tool
(the "shared mutable index" carve-out): a crawl processed in MANY jobs
over time must drop documents already accepted by ANY earlier job, so
the seen-set must be shared, mutable, and outlive a single pipeline.

Design: ``num_shards`` actors each own one hash-partition of the seen
set; ``filter_new`` is a normal streaming ``map_batches`` stage whose
batches claim their content hashes shard-by-shard (``add_if_new`` is
atomic per shard — actor calls serialize — so concurrent batches can
never both claim the same hash).  Per batch: ≤ num_shards small remote
calls carrying only int64 hashes.

Semantics note (documented, intentional): WHICH copy of a duplicate
survives follows arrival order — first claim wins.  That is the
incremental-crawl contract; for deterministic within-corpus dedup use
``dedup.exact_dedup``.

Scale notes: memory is the exact seen-set, 8-byte hashes sharded
across actors (place shards across nodes in a real cluster); at
extreme cardinalities swap the shard's set for a Bloom/quotient filter
(same interface, small false-drop rate) — the interface keeps that
swap local to the actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def content_hash64(text: str) -> int:
    """Stable 64-bit content hash (md5 truncation — same digest family
    as ``dedup.add_content_hash``)."""
    return int.from_bytes(
        hashlib.md5((text or "").encode("utf-8")).digest()[:8], "big",
        signed=False)


class _ShardImpl:
    """One hash-partition of the seen set (plain class; wrapped by
    ray.remote at index construction so importing this module never
    requires an initialized Ray)."""

    def __init__(self) -> None:
        self.seen: set[int] = set()

    def add_if_new(self, hashes: list[int]) -> list[bool]:
        seen = self.seen
        out = []
        for h in hashes:
            if h in seen:
                out.append(False)
            else:
                seen.add(h)
                out.append(True)
        return out

    def contains(self, hashes: list[int]) -> list[bool]:
        return [h in self.seen for h in hashes]

    def size(self) -> int:
        return len(self.seen)


class DedupIndex:
    """Sharded shared seen-set.  Create once, pass to ``filter_new``
    for every job/pipeline that must respect it."""

    def __init__(self, num_shards: int = 8) -> None:
        import ray

        shard_cls = ray.remote(num_cpus=0)(_ShardImpl)
        self.num_shards = num_shards
        self.shards = [shard_cls.remote() for _ in range(num_shards)]

    def sizes(self) -> list[int]:
        import ray

        return ray.get([s.size.remote() for s in self.shards])

    def total(self) -> int:
        return sum(self.sizes())

    def filter_new(self, ds, col: str = "text"):
        """→ Dataset of rows whose content hash was not seen before (by
        this or any previous call against the same index).  Streaming:
        each batch claims its hashes and filters locally."""
        shards = self.shards
        n = self.num_shards

        def claim(b: pa.Table) -> pa.Table:
            import ray

            texts = b[col].to_pylist()
            hs = np.fromiter((content_hash64(t) for t in texts),
                             np.uint64, len(texts))
            # within-batch first-occurrence wins
            _, first_idx = np.unique(hs, return_index=True)
            is_first = np.zeros(len(hs), bool)
            is_first[first_idx] = True
            keep = np.zeros(len(hs), bool)
            part = (hs % np.uint64(n)).astype(np.int64)
            calls = []
            call_rows = []
            for s in range(n):
                rows = np.flatnonzero(is_first & (part == s))
                if len(rows):
                    calls.append(shards[s].add_if_new.remote(
                        [int(h) for h in hs[rows]]))
                    call_rows.append(rows)
            for rows, mask in zip(call_rows, ray.get(calls)):
                keep[rows] = mask
            return b.filter(pa.array(keep))

        return ds.map_batches(claim, batch_format="pyarrow")
