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


# ---------------------------------------------------------------------------
# incremental NEAR-dup index (banded MinHash across jobs)
# ---------------------------------------------------------------------------

class _BandShardImpl:
    """One hash-partition of the banded signature store: band_key →
    up to ``bucket_cap`` stored signatures (bytes).  A hot boilerplate
    bucket truncates at the cap — any ONE stored signature already
    rejects future near-dups of that content, so rejection recall is
    unaffected; the cap only bounds memory."""

    def __init__(self, num_perm: int, threshold_num: int,
                 bucket_cap: int) -> None:
        self.buckets: dict[int, list[bytes]] = {}
        self.num_perm = num_perm
        self.threshold_num = threshold_num  # matching components needed
        self.bucket_cap = bucket_cap

    def _matches(self, band_key: int, sig: bytes) -> bool:
        stored = self.buckets.get(band_key)
        if not stored:
            return False
        q = np.frombuffer(sig, np.uint64)
        for s in stored:
            agree = int((np.frombuffer(s, np.uint64) == q).sum())
            if agree >= self.threshold_num:
                return True
        return False

    def probe(self, band_keys: list[int], sigs: list[bytes]) -> list[bool]:
        return [self._matches(k, s) for k, s in zip(band_keys, sigs)]

    def insert(self, band_keys: list[int], sigs: list[bytes]) -> None:
        for k, s in zip(band_keys, sigs):
            b = self.buckets.setdefault(k, [])
            if len(b) < self.bucket_cap:
                b.append(s)

    def size(self) -> int:
        return sum(len(v) for v in self.buckets.values())


class _NearDupClaim:
    """Actor-pool map stage: per batch — signature (warm MinHasher
    word cache), within-batch first-wins near-dup check, shard probe,
    then insert for survivors."""

    def __init__(self, index: "NearDupIndex", col: str) -> None:
        from .dedup import MinHasher

        self.index = index
        self.hasher = MinHasher(col=col, num_perm=index.num_perm)
        self.col = col

    def __call__(self, b: pa.Table) -> pa.Table:
        import ray

        from .dedup import _mix64

        idx = self.index
        n_docs = len(b)
        if n_docs == 0:
            return b
        sigs_tbl = self.hasher(b)
        sigs = np.asarray(sigs_tbl["minhash"].to_pylist(), np.uint64)
        rows_per_band = idx.num_perm // idx.bands
        # band keys: splitmix fold of each band's components (the
        # _explode_bands recipe) + band index salt
        band_keys = np.empty((n_docs, idx.bands), np.uint64)
        for bi in range(idx.bands):
            chunk = sigs[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            acc = np.full(n_docs, 0x9E3779B97F4A7C15, np.uint64)
            for j in range(rows_per_band):
                acc = _mix64(acc ^ chunk[:, j])
            band_keys[:, bi] = _mix64(acc ^ np.uint64(bi))
        sig_bytes = [s.tobytes() for s in sigs]
        thr = idx.threshold_num

        # phase A: within-batch first-wins
        local: dict[int, list[int]] = {}
        keep = np.ones(n_docs, bool)
        for i in range(n_docs):
            hit = False
            for bi in range(idx.bands):
                for j in local.get(int(band_keys[i, bi]), ()):
                    if int((sigs[j] == sigs[i]).sum()) >= thr:
                        hit = True
                        break
                if hit:
                    break
            if hit:
                keep[i] = False
            else:
                for bi in range(idx.bands):
                    local.setdefault(int(band_keys[i, bi]), []).append(i)

        # phase B: shard probe for batch survivors
        cand = np.flatnonzero(keep)
        ns = idx.num_shards
        calls, meta = [], []
        for s in range(ns):
            ks, ss, rows = [], [], []
            for i in cand:
                for bi in range(idx.bands):
                    k = int(band_keys[i, bi])
                    if k % ns == s:
                        ks.append(k)
                        ss.append(sig_bytes[i])
                        rows.append(i)
            if ks:
                calls.append(idx.shards[s].probe.remote(ks, ss))
                meta.append(rows)
        for rows, hits in zip(meta, ray.get(calls)):
            for i, h in zip(rows, hits):
                if h:
                    keep[i] = False

        # phase C: insert survivors (cross-batch race documented: two
        # concurrent batches can each accept one of a mutually-near-dup
        # pair — run within-corpus dedup first; the index guards
        # ACROSS jobs, where batches of different jobs never overlap)
        calls = []
        for s in range(ns):
            ks, ss = [], []
            for i in np.flatnonzero(keep):
                for bi in range(idx.bands):
                    k = int(band_keys[i, bi])
                    if k % ns == s:
                        ks.append(k)
                        ss.append(sig_bytes[i])
            if ks:
                calls.append(idx.shards[s].insert.remote(ks, ss))
        ray.get(calls)
        return b.filter(pa.array(keep))


class NearDupIndex:
    """Sharded cross-job NEAR-duplicate index: banded MinHash buckets
    in ``num_shards`` actors.  A document is dropped when any of its
    band buckets holds a stored signature agreeing on ≥
    ``sim_threshold`` of the minhash components (Jaccard estimate);
    accepted documents insert their signature into all their buckets.
    The near-dup complement of `DedupIndex` — same carve-out
    rationale (shared mutable state across jobs), same sharding."""

    def __init__(self, num_shards: int = 8, num_perm: int = 64,
                 bands: int = 8, sim_threshold: float = 0.8,
                 bucket_cap: int = 16) -> None:
        import ray

        assert num_perm % bands == 0
        self.num_shards = num_shards
        self.num_perm = num_perm
        self.bands = bands
        self.threshold_num = int(round(sim_threshold * num_perm))
        shard_cls = ray.remote(num_cpus=0)(_BandShardImpl)
        self.shards = [shard_cls.remote(num_perm, self.threshold_num,
                                        bucket_cap)
                       for _ in range(num_shards)]

    def total(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))

    def filter_new(self, ds, col: str = "text", concurrency=(1, 4),
                   batch_size: int = 256):
        """Streaming stage: keep only documents not near-duplicating
        anything accepted by THIS or ANY EARLIER job through the same
        index."""
        return ds.map_batches(_NearDupClaim,
                              fn_constructor_args=(self, col),
                              batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency, num_cpus=1)
