"""Deduplication ops: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All Ray-Data-first and shuffle-aware:

- **exact**: vectorized content-hash in ``map_batches`` → per-block
  combiner (one partial per distinct hash per block) → native
  ``groupby(hash).aggregate(Min, Sum)``.  The only shuffle moves
  (hash, doc_id, count) partials, not document text.
- **MinHash+LSH**: shingle → 64-perm minhash signature per doc (one
  ``map_batches`` pass) → explode to (band_id, band_hash, doc_id,
  signature) rows → ``groupby(band)`` emits candidate pairs → pairwise
  signature-estimated Jaccard filter → connected components by
  min-label propagation.  Signatures ride along the band rows so the
  verify step needs no second join — the standard trade of bandwidth
  for a join at scale.
- **SimHash**: 64-bit signature; candidates from 4×16-bit band buckets;
  Hamming-distance verify.
- **n-gram Jaccard**: exact verification variant for small candidate
  sets (character n-grams).
- **embedding cosine**: random-hyperplane LSH buckets → exact cosine
  verify within buckets.

Cluster labeling is adaptive by EXACT edge count (``_assign_clusters``):
small edge lists use the O(edges) driver union-find, large ones run
``ops/cc.py``'s vectorized distributed label propagation; label
assignment is always Dataset-side (``attach_labels`` — broadcast when
small, co-group otherwise).  No function here materializes
corpus-cardinality data on the driver; every public op returns a
Dataset.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WORD_RE = re.compile(r"\w+")

# deterministic minhash permutation parameters (seed folded in, no RNG state)
_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    # LCG-derived odd multipliers/offsets — stable across runs/machines
    ks = np.arange(1, num_perm + 1, dtype=np.uint64)
    a = (2862933555777941757 * (ks + seed) + 3037000493) % _MERSENNE
    b = (3202034522624059733 * (ks + 7 * seed) + 4354685564936845319) % _MERSENNE
    return (a | 1), b


def _md5_u64(s: str) -> int:
    """Stable 64-bit string hash: little-endian int of the first 8 md5
    bytes — exactly DuckDB's ``md5_number_upper``, so every op built on
    it (minhash shingles, char n-grams, simhash) is SQL-replicable.
    PYTHONHASHSEED-independent."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _char_ngram_hashes(text: str, n: int = 5) -> np.ndarray:
    t = " ".join(text.lower().split())
    grams = {t[i:i + n] for i in range(max(1, len(t) - n + 1))} if t else set()
    out = np.empty(len(grams), np.uint64)
    for i, g in enumerate(sorted(grams)):
        out[i] = _md5_u64(g)
    return out


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, np.uint64)
    # (a*h + b) mod p, then min over shingles, vectorized via object->u64
    h = hashes.astype(np.uint64)[:, None]
    vals = (h * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0).astype(np.uint64)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    texts = batch[col].to_pylist()
    hs = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("content_hash", pa.array(hs, pa.string()))


def exact_dedup(ds, col: str = "text", key: str = "doc_id"):
    """→ Dataset(doc_id, n_dups): one surviving row (min key) per distinct
    content hash.

    Combiner-then-hash-aggregate (the pre-aggregate-before-shuffle
    rule, SURVEY §4.3): a vectorized per-block combiner collapses each
    block to one (hash, min key, count) partial per distinct hash —
    so a pathological hot hash (one viral page duplicated millions of
    times) contributes at most ONE row per block to the shuffle, which
    makes explicit salting unnecessary — then a single native
    ``groupby(hash).aggregate(Min, Sum)`` combines the partials.  No
    per-group Python anywhere (the round-1 ``map_groups`` phase pair
    cost one interpreter call per distinct hash)."""
    from ray.data.aggregate import Min, Sum

    hashed = ds.map_batches(lambda b: add_content_hash(b, col),
                            batch_format="pyarrow")

    def combine_block(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "content_hash": b["content_hash"].to_pandas(),
            key: b[key].to_pandas(),
        })
        g = df.groupby("content_hash", sort=False)[key].agg(["min", "count"])
        return pa.table({
            "content_hash": pa.array(g.index, pa.string()),
            key: pa.array(g["min"].to_numpy(), pa.int64()),
            "n_dups": pa.array(g["count"].to_numpy(), pa.int64()),
        })

    partials = hashed.select_columns([key, "content_hash"]).map_batches(
        combine_block, batch_format="pyarrow")
    out = partials.groupby("content_hash").aggregate(
        Min(key, alias_name=key), Sum("n_dups", alias_name="n_dups"))
    return out.select_columns([key, "n_dups"])


# ---------------------------------------------------------------------------
# near-dup: shared LSH machinery
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor stage: text → minhash signature column.  Warm per-worker
    state: permutation tables AND a word-hash cache (crawl vocabulary
    repeats heavily across documents, so most words hit the cache and
    the shingle hashes reduce to a vectorized splitmix fold — no
    per-shingle hashlib calls on the hot path)."""

    def __init__(self, col: str = "text", num_perm: int = 64, k: int = 3,
                 char_ngrams: bool = False,
                 word_cache_max: int = 1 << 20) -> None:
        self.col = col
        self.num_perm = num_perm
        self.k = k
        self.char_ngrams = char_ngrams
        self.a, self.b = _perm_params(num_perm)
        self._wcache: dict[str, int] = {}
        self._wcache_max = word_cache_max

    def _word_hashes(self, words: list[str]) -> np.ndarray:
        cache = self._wcache
        out = np.empty(len(words), np.uint64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = _md5_u64(w)
                if len(cache) < self._wcache_max:
                    cache[w] = h
            out[i] = h
        return out

    def _shingles(self, text: str) -> np.ndarray:
        words = _WORD_RE.findall(text.lower())
        if not words:
            return np.empty(0, np.uint64)
        wh = self._word_hashes(words)
        k = self.k
        n = len(wh) - k + 1
        if n <= 0:
            # shorter than one shingle: fold everything into one hash
            acc = np.full(1, 0x9E3779B97F4A7C15, np.uint64)
            for j in range(len(wh)):
                acc = _mix64(acc ^ wh[j:j + 1])
            return acc
        # order-sensitive vectorized fold over the k window positions
        acc = np.full(n, 0x9E3779B97F4A7C15, np.uint64)
        for j in range(k):
            acc = _mix64(acc ^ wh[j:j + n])
        return acc

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col].to_pylist()
        sigs = np.empty((len(texts), self.num_perm), np.uint64)
        for i, t in enumerate(texts):
            hs = (_char_ngram_hashes(t or "", self.k) if self.char_ngrams
                  else self._shingles(t or ""))
            sigs[i] = minhash_signature(hs, self.a, self.b)
        return batch.append_column(
            "minhash", pa.array(list(sigs), pa.list_(pa.uint64(), self.num_perm)))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized, deterministic across
    platforms (uint64 wraparound semantics)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _explode_bands(batch: pa.Table, key: str, bands: int, rows_per_band: int) -> pa.Table:
    """doc rows → (band:uint64, key, minhash) rows, fully vectorized:
    the band bucket id is a splitmix64 fold of the band's signature
    chunk (+ band index), computed for the whole batch in numpy — no
    per-doc Python, no per-band hashlib calls.  The signature rides
    along so the verify step needs no second join (documented ×bands
    bandwidth trade)."""
    n = len(batch)
    if n == 0:
        return pa.table({"band": pa.array([], pa.uint64()),
                         key: pa.array([], pa.int64()),
                         "minhash": pa.array([], pa.list_(pa.uint64(),
                                                          bands * rows_per_band))})
    ids = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
    sig_arr = batch["minhash"].combine_chunks()
    num_perm = sig_arr.type.list_size
    sigs = sig_arr.flatten().to_numpy(zero_copy_only=False).reshape(n, num_perm)
    chunks = sigs.reshape(n, bands, rows_per_band)
    band_idx = np.arange(bands, dtype=np.uint64)
    h = np.broadcast_to(_mix64(band_idx), (n, bands)).copy()
    for r in range(rows_per_band):
        h = _mix64(h ^ chunks[:, :, r].astype(np.uint64))
    rep_sigs = np.repeat(sigs, bands, axis=0)
    return pa.table({
        "band": pa.array(h.reshape(-1), pa.uint64()),
        key: pa.array(np.repeat(ids, bands), pa.int64()),
        "minhash": pa.FixedSizeListArray.from_arrays(
            pa.array(rep_sigs.reshape(-1), pa.uint64()), num_perm),
    })


_EMPTY_PAIRS = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _add_band_part(t: pa.Table, band_col: str, num_partitions: int) -> pa.Table:
    """Coarse partition tag for bucket co-grouping: P Ray groups total
    instead of one per LSH bucket (at 10^12 docs × 16 bands the naive
    ``groupby(band)`` would make ~10^13 interpreter calls)."""
    import pandas as pd

    col = t[band_col]
    if pa.types.is_integer(col.type):
        part = (np.abs(col.to_numpy(zero_copy_only=False).astype(np.int64))
                % num_partitions)
    else:
        part = (pd.util.hash_array(np.asarray(col.to_pylist(), object))
                % num_partitions).astype(np.int64)
    return t.append_column("_part", pa.array(part, pa.int64()))


def _band_runs(g: pa.Table, band_col: str, key: str, sort_extra=()):
    """Sort one partition by (band, key) and yield the run boundaries —
    shared machinery of the vectorized pair generators."""
    import pyarrow.compute as pc

    order = pc.sort_indices(g, sort_keys=[(band_col, "ascending"),
                                          (key, "ascending")])
    g = g.take(order)
    col = g[band_col]
    if pa.types.is_integer(col.type):
        bands = col.to_numpy(zero_copy_only=False)
    else:
        bands = np.asarray(col.to_pylist(), dtype=object)
    change = np.ones(len(g), bool)
    if len(g) > 1:
        change[1:] = bands[1:] != bands[:-1]
    starts = np.flatnonzero(change)
    ends = np.r_[starts[1:], len(g)] if len(starts) else np.array([], np.int64)
    return g, starts, ends


#: bucket-run length above which pair emission switches from all-pairs
#: to a star anchored at the min-id member.  One viral page duplicated
#: 10^6 times lands 10^6 rows in one band bucket; all-pairs would emit
#: 10^12 edges in one partition.  The star emits m−1 edges with
#: IDENTICAL connected components for exact duplicates (and for any
#: transitively-similar run); only near-misses that fail vs the anchor
#: but would pass against some other member are lost — below the cap
#: pairs stay exact.
HOT_RUN_CAP = 1024


def _minhash_pairs_partition(g: pa.Table, key: str, threshold_num: int,
                             threshold_den: int) -> pa.Table:
    """One coarse partition's band rows → verified candidate pairs
    (signature-estimated Jaccard ≥ threshold_num/threshold_den, integer
    compare).  Signature matrix is decoded ONCE per partition
    (zero-copy from the fixed-size-list values); the per-bucket work is
    a numpy broadcast compare.  Runs longer than ``HOT_RUN_CAP`` verify
    against the min-id anchor only (m−1 comparisons, ≤ m−1 edges)."""
    if len(g) < 2:
        return _EMPTY_PAIRS.empty_table()
    g, starts, ends = _band_runs(g, "band", key)
    ids = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
    sig_arr = g["minhash"].combine_chunks()
    num_perm = sig_arr.type.list_size
    sigs = sig_arr.flatten().to_numpy(zero_copy_only=False).reshape(
        len(g), num_perm)
    chunks_a: list[np.ndarray] = []
    chunks_b: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        sub_ids = ids[s:e]  # ascending (run sorted by key)
        sub_sigs = sigs[s:e]
        rng = range(1) if m > HOT_RUN_CAP else range(m - 1)
        for i in rng:
            eq = (sub_sigs[i + 1:] == sub_sigs[i]).sum(axis=1)
            hit = np.flatnonzero(eq * threshold_den
                                 >= threshold_num * num_perm)
            if len(hit):
                chunks_a.append(np.full(len(hit), sub_ids[i], np.int64))
                chunks_b.append(sub_ids[i + 1 + hit])
    if not chunks_a:
        return _EMPTY_PAIRS.empty_table()
    return pa.table({"a": pa.array(np.concatenate(chunks_a), pa.int64()),
                     "b": pa.array(np.concatenate(chunks_b), pa.int64())})


def _connected_components(pairs: "np.ndarray") -> dict[int, int]:
    """Min-label propagation to fixpoint (driver-side on the candidate
    edge list; at cluster scale: same algorithm as groupby rounds)."""
    label: dict[int, int] = {}
    for x, y in pairs:
        label.setdefault(int(x), int(x))
        label.setdefault(int(y), int(y))

    def find(v: int) -> int:
        r = v
        while label[r] != r:
            r = label[r]
        while label[v] != r:
            label[v], v = r, label[v]
        return r

    for x, y in pairs:
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            if rx < ry:
                label[ry] = rx
            else:
                label[rx] = ry
    return {v: find(v) for v in label}


#: edge-count ceiling for the driver union-find (a few hundred MB of
#: int pairs at most — NOT corpus-proportional: near-dup edge lists are
#: bounded by the number of duplicated docs, and the gate is an exact
#: count, not a hope)
DRIVER_CC_LIMIT = 2_000_000


def _assign_clusters(ds, pairs_ds, key: str,
                     distributed_cc: "bool | None" = None,
                     num_partitions: int = 8):
    """Candidate-pair edges → Dataset(key, cluster_id) over ALL rows of
    ``ds`` (docs without a near-dup pair keep their own id).

    Adaptive by exact edge count (``distributed_cc=None``, the
    default): the materialized edge list's count gates the path —
    ≤ ``DRIVER_CC_LIMIT`` edges run the O(edges) driver union-find
    (bounded, NOT corpus-proportional); above it, connected components
    run wholly in Datasets (``ops/cc.py`` vectorized label
    propagation, whose per-round shuffle overhead only pays for itself
    on big edge lists).  Label ASSIGNMENT is always Dataset-side
    (``attach_labels``: broadcast when small, co-group otherwise) —
    nothing of corpus cardinality ever lands on the driver (the
    round-1 version pulled every doc id into driver pandas).  Pass
    ``True``/``False`` to force a path (tests compare them
    row-for-row)."""
    from .cc import attach_labels, connected_components_ds

    pairs_ds = pairs_ds.materialize()  # consumed twice (count + CC)
    if distributed_cc is None:
        distributed_cc = pairs_ds.count() > DRIVER_CC_LIMIT
    if distributed_cc:
        labels = connected_components_ds(pairs_ds,
                                         num_partitions=num_partitions)
    else:
        import ray.data as rd

        pairs_df = pairs_ds.to_pandas()  # ≤ DRIVER_CC_LIMIT rows by gate
        pairs = np.unique(np.asarray(pairs_df[["a", "b"]], np.int64), axis=0) \
            if len(pairs_df) else np.empty((0, 2), np.int64)
        comp = _connected_components(pairs)
        labels = rd.from_arrow(pa.table({
            "node": pa.array(list(comp.keys()), pa.int64()),
            "label": pa.array(list(comp.values()), pa.int64())}))
    return attach_labels(ds.select_columns([key]), labels, key,
                         out_col="cluster_id")


def _explode_bands_slim(batch: pa.Table, key: str, bands: int,
                        rows_per_band: int) -> pa.Table:
    """Band rows WITHOUT the riding signature — (band, key) only, 1/16th
    the band-row bandwidth of ``_explode_bands``; verification happens
    after a signature rejoin."""
    full = _explode_bands(batch, key, bands, rows_per_band)
    return full.drop_columns(["minhash"])


def _bucket_pairs_partition(g: pa.Table, key: str) -> pa.Table:
    """Bucket runs → UNVERIFIED candidate pairs (a < b), deduplicated
    within the partition.  Runs longer than ``HOT_RUN_CAP`` emit the
    star toward the min-id member — m−1 edges with connected components
    identical to the m² clique, and no ``np.triu_indices`` m²
    allocation."""
    if len(g) < 2:
        return _EMPTY_PAIRS.empty_table()
    g, starts, ends = _band_runs(g, "band", key)
    ids = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
    chunks_a: list[np.ndarray] = []
    chunks_b: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        sub = ids[s:e]  # ascending (run sorted by key)
        if m > HOT_RUN_CAP:
            chunks_a.append(np.full(m - 1, sub[0], np.int64))
            chunks_b.append(sub[1:])
        else:
            ii, jj = np.triu_indices(m, k=1)
            chunks_a.append(sub[ii])
            chunks_b.append(sub[jj])
    if not chunks_a:
        return _EMPTY_PAIRS.empty_table()
    pairs = np.unique(np.stack([np.concatenate(chunks_a),
                                np.concatenate(chunks_b)], axis=1), axis=0)
    return pa.table({"a": pa.array(pairs[:, 0], pa.int64()),
                     "b": pa.array(pairs[:, 1], pa.int64())})


def _attach_sig(pairs_ds, sigs_ds, key: str, pair_col: str, out_col: str,
                num_perm: int, num_partitions: int = 64):
    """Co-group half-join: attach each pair row's signature for
    ``pair_col`` (one hash exchange of (ids, sigs) + pair rows; a
    vectorized searchsorted gather per partition)."""
    existing = [c for c in ("a", "b", "sig_a", "sig_b")
                if c in pairs_ds.schema().names]

    def tag_pairs(t: pa.Table) -> pa.Table:
        ids = t[pair_col].to_numpy(zero_copy_only=False)
        cols = {"_part": pa.array(np.abs(ids) % num_partitions, pa.int64()),
                "_side": pa.array(np.zeros(len(t), np.int8))}
        for c in existing:
            cols[c] = t[c]
        cols["_sig"] = pa.FixedSizeListArray.from_arrays(
            pa.array(np.zeros(len(t) * num_perm, np.uint64), pa.uint64()),
            num_perm)
        return pa.table(cols)

    def tag_sigs(t: pa.Table) -> pa.Table:
        ids = t[key].to_numpy(zero_copy_only=False)
        n = len(t)
        cols = {"_part": pa.array(np.abs(ids) % num_partitions, pa.int64()),
                "_side": pa.array(np.ones(n, np.int8))}
        for c in existing:
            if c in ("a", "b"):
                cols[c] = t[key] if c == pair_col else pa.array(
                    np.zeros(n, np.int64), pa.int64())
            else:
                cols[c] = pa.FixedSizeListArray.from_arrays(
                    pa.array(np.zeros(n * num_perm, np.uint64), pa.uint64()),
                    num_perm)
        cols["_sig"] = t["minhash"]
        return pa.table(cols)

    both = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
        sigs_ds.map_batches(tag_sigs, batch_format="pyarrow"))

    def resolve(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        is_sig = side == 1
        sig_arr = g["_sig"].combine_chunks()
        mat = sig_arr.flatten().to_numpy(zero_copy_only=False).reshape(
            len(g), num_perm)
        key_vals = g[pair_col].to_numpy(zero_copy_only=False)
        sn = key_vals[is_sig]
        order = np.argsort(sn, kind="stable")
        sn_sorted = sn[order]
        sig_rows = mat[is_sig][order]
        pr = ~is_sig
        want = key_vals[pr]
        pos = np.searchsorted(sn_sorted, want)
        pos = np.minimum(pos, max(0, len(sn_sorted) - 1))
        gathered = (sig_rows[pos] if len(sn_sorted)
                    else np.zeros((len(want), num_perm), np.uint64))
        out = {}
        for c in existing:
            out[c] = g[c].filter(pa.array(pr))
        out[out_col] = pa.FixedSizeListArray.from_arrays(
            pa.array(gathered.reshape(-1), pa.uint64()), num_perm)
        return pa.table(out)

    return both.groupby("_part").map_groups(resolve, batch_format="pyarrow")


def minhash_lsh_dedup(ds, col: str = "text", key: str = "doc_id",
                      num_perm: int = 64, bands: int = 16, k: int = 3,
                      threshold: tuple[int, int] = (4, 5),
                      char_ngrams: bool = False, concurrency=(2, 8),
                      distributed_cc: "bool | None" = None,
                      carry_signatures: bool = True):
    """→ Dataset(doc_id, cluster_id): near-duplicate clusters.

    threshold = (num, den): estimated Jaccard ≥ num/den keeps a pair.
    ``char_ngrams=True`` gives the n-gram-Jaccard variant.

    ``carry_signatures`` picks the verification shape (identical
    results): True ships the signature on every band row (×bands
    bandwidth, no extra exchange — right when signatures are small vs
    text); False ships slim (band, key) rows, deduplicates the
    candidate pairs, and REJOINS signatures via two co-group half-joins
    before verifying — ~1/bands the band-row bytes at the cost of two
    extra slim exchanges (right at extreme scale where the band
    exchange dominates)."""
    rows_per_band = num_perm // bands
    sigs = ds.select_columns([key, col]).map_batches(
        MinHasher, fn_constructor_args=(col, num_perm, k, char_ngrams),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
    if carry_signatures:
        band_rows = sigs.select_columns([key, "minhash"]).map_batches(
            lambda b: _add_band_part(
                _explode_bands(b, key, bands, rows_per_band), "band", 64),
            batch_format="pyarrow")
        pairs_ds = band_rows.groupby("_part").map_groups(
            lambda g: _minhash_pairs_partition(g, key, *threshold),
            batch_format="pyarrow")
        return _assign_clusters(ds, pairs_ds, key, distributed_cc)
    sigs = sigs.select_columns([key, "minhash"]).materialize()  # reused twice
    band_rows = sigs.map_batches(
        lambda b: _add_band_part(
            _explode_bands_slim(b, key, bands, rows_per_band), "band", 64),
        batch_format="pyarrow")
    cand = band_rows.groupby("_part").map_groups(
        lambda g: _bucket_pairs_partition(g, key), batch_format="pyarrow")
    # global pair dedup (a pair can surface from several bands)
    from ray.data.aggregate import Count

    cand = cand.groupby(["a", "b"]).aggregate(
        Count(alias_name="_n")).drop_columns(["_n"])
    with_a = _attach_sig(cand, sigs, key, "a", "sig_a", num_perm)
    with_ab = _attach_sig(with_a, sigs, key, "b", "sig_b", num_perm)

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _EMPTY_PAIRS.empty_table()
        sa = t["sig_a"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(len(t), num_perm)
        sb = t["sig_b"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(len(t), num_perm)
        eq = (sa == sb).sum(axis=1)
        keep = eq * threshold[1] >= threshold[0] * num_perm
        return pa.table({"a": t["a"].filter(pa.array(keep)),
                         "b": t["b"].filter(pa.array(keep))})

    pairs_ds = with_ab.map_batches(verify, batch_format="pyarrow")
    return _assign_clusters(ds, pairs_ds, key, distributed_cc)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _word_hash64(w: str) -> bytes:
    """64-bit word hash for SimHash as 8 big-endian bytes.

    Defined as the little-endian integer of the first 8 md5 bytes —
    exactly DuckDB's ``md5_number_upper`` — so the full SimHash
    definition is SQL-expressible and the ``simhash_dedup`` driver
    query gets a real hash-checked oracle."""
    return hashlib.md5(w.encode()).digest()[:8][::-1]


class SimHasher:
    """Actor stage: 64-bit SimHash of word features.  Warm per-worker
    word-hash cache + vectorized bit accumulation (one matrix product
    per document instead of a Python loop per word); output values are
    bit-identical to the scalar definition in ``simhash64``."""

    def __init__(self, col: str = "text",
                 word_cache_max: int = 1 << 20) -> None:
        self.col = col
        self._wcache: dict[str, np.ndarray] = {}  # word → ±1 bit row (64,)
        self._wcache_max = word_cache_max

    @staticmethod
    def simhash64(text: str) -> int:
        counts = {}
        for w in _WORD_RE.findall(text.lower()):
            counts[w] = counts.get(w, 0) + 1
        acc = np.zeros(64, np.int64)
        for w, c in counts.items():
            bits = np.unpackbits(np.frombuffer(_word_hash64(w), np.uint8))
            acc += (bits.astype(np.int64) * 2 - 1) * c
        out = 0
        for i, v in enumerate(acc):
            if v > 0:
                out |= 1 << (63 - i)
        return out

    def _bit_row(self, w: str) -> np.ndarray:
        row = self._wcache.get(w)
        if row is None:
            row = (np.unpackbits(np.frombuffer(_word_hash64(w), np.uint8))
                   .astype(np.int64) * 2 - 1)
            if len(self._wcache) < self._wcache_max:
                self._wcache[w] = row
        return row

    def _simhash_fast(self, text: str) -> int:
        counts: dict[str, int] = {}
        for w in _WORD_RE.findall(text.lower()):
            counts[w] = counts.get(w, 0) + 1
        if not counts:
            return 0
        rows = np.stack([self._bit_row(w) for w in counts])
        c = np.fromiter(counts.values(), np.int64, len(counts))
        acc = c @ rows
        bits = (acc > 0).astype(np.uint8)
        return int.from_bytes(np.packbits(bits).tobytes(), "big")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col].to_pylist()
        hs = np.array([self._simhash_fast(t or "") for t in texts], np.uint64)
        return batch.append_column("simhash", pa.array(hs, pa.uint64()))


def simhash_dedup(ds, col: str = "text", key: str = "doc_id",
                  max_hamming: int = 3, concurrency=(2, 8),
                  distributed_cc: "bool | None" = None,
                  precomputed: bool = False):
    """→ Dataset(doc_id, cluster_id): SimHash near-dup clusters.
    Candidates from 4×16-bit band buckets (any pair within Hamming ≤ 3
    shares at least one identical 16-bit band).

    ``precomputed=True``: ``col`` already holds 64-bit fingerprints
    (int64 bit-pattern or uint64) — e.g. a perceptual image aHash from
    `ops/multimodal.ImageHashStage` — and the text-hashing actor stage
    is skipped; banding / capped pair emission / hamming verify / CC
    are shared unchanged."""
    if precomputed:
        def as_sig(t: pa.Table) -> pa.Table:
            h = t[col].to_numpy(zero_copy_only=False) \
                .astype(np.int64).view(np.uint64)
            return pa.table({key: t[key],
                             "simhash": pa.array(h, pa.uint64())})

        sigs = ds.select_columns([key, col]).map_batches(
            as_sig, batch_format="pyarrow")
    else:
        sigs = ds.select_columns([key, col]).map_batches(
            SimHasher, fn_constructor_args=(col,), batch_format="pyarrow",
            concurrency=concurrency, num_cpus=1
        ).select_columns([key, "simhash"])

    def explode(b: pa.Table) -> pa.Table:
        ids = b[key].to_pylist()
        hs = b["simhash"].to_pylist()
        out = {"band": [], key: [], "simhash": []}
        for i, h in zip(ids, hs):
            for band in range(4):
                chunk = (h >> (band * 16)) & 0xFFFF
                out["band"].append(band * 65536 + chunk)
                out[key].append(i)
                out["simhash"].append(h)
        return pa.table({"band": pa.array(out["band"], pa.int64()),
                         key: pa.array(out[key]),
                         "simhash": pa.array(out["simhash"], pa.uint64())})

    def pairs_partition(g: pa.Table) -> pa.Table:
        """One coarse partition's bucket rows → Hamming-verified pairs
        (vectorized popcount via uint64 xor + bit tricks per bucket).
        Runs longer than ``HOT_RUN_CAP`` verify against the min-id
        anchor only (see ``HOT_RUN_CAP``)."""
        if len(g) < 2:
            return _EMPTY_PAIRS.empty_table()
        g, starts, ends = _band_runs(g, "band", key)
        ids = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        chunks_a: list[np.ndarray] = []
        chunks_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            sub_ids = ids[s:e]
            sub_hs = hs[s:e]
            rng = range(1) if m > HOT_RUN_CAP else range(m - 1)
            for i in rng:
                x = sub_hs[i + 1:] ^ sub_hs[i]
                # vectorized 64-bit popcount
                x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
                x = ((x & np.uint64(0x3333333333333333)) +
                     ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
                x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
                pop = (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
                hit = np.flatnonzero(pop <= max_hamming)
                if len(hit):
                    chunks_a.append(np.full(len(hit), sub_ids[i], np.int64))
                    chunks_b.append(sub_ids[i + 1 + hit])
        if not chunks_a:
            return _EMPTY_PAIRS.empty_table()
        return pa.table({"a": pa.array(np.concatenate(chunks_a), pa.int64()),
                         "b": pa.array(np.concatenate(chunks_b), pa.int64())})

    pairs_ds = sigs.map_batches(explode, batch_format="pyarrow").map_batches(
        lambda t: _add_band_part(t, "band", 64), batch_format="pyarrow"
    ).groupby("_part").map_groups(pairs_partition, batch_format="pyarrow")
    return _assign_clusters(ds, pairs_ds, key, distributed_cc)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dedup(ds, key: str = "vec_id", col: str = "embedding",
                    threshold: float = 0.95, n_planes: int = 12,
                    distributed_cc: "bool | None" = None,
                    n_probe_bits: int = 0, dim: "int | None" = None):
    """→ Dataset(vec_id, cluster_id): cosine-similarity near-dup via
    random-hyperplane LSH buckets + exact verify within buckets.
    Hyperplanes are a deterministic seeded Gaussian matrix
    regenerated INSIDE each task from the fixed seed and the batch's
    own dimensionality (dim·n_planes ≈ a few hundred floats — cheaper
    to recompute than to ship, and it removes any driver-side
    ``take(1)`` dim probe; the seed makes every task's matrix
    bit-identical).  ``dim``, when given, is asserted against the
    data.

    ``n_probe_bits``: MULTI-PROBE recall knob — each vector is also
    emitted into the buckets reached by flipping its ``n_probe_bits``
    least-confident hyperplane bits (smallest |margin|), catching true
    near-dup pairs that straddle a hyperplane boundary.  Costs
    (1 + n_probe_bits)× bucket rows; duplicate candidate pairs across
    probes are harmless (connected components absorbs them)."""

    def bucketize(b: pa.Table) -> pa.Table:
        vecs = np.asarray(b[col].to_pylist(), np.float64)
        if vecs.ndim != 2:  # empty batch
            return pa.table({key: b[key],
                             "bucket": pa.array([], pa.int64()),
                             col: b[col]})
        if dim is not None and vecs.shape[1] != dim:
            raise ValueError(
                f"embedding_dedup: batch dim {vecs.shape[1]} != "
                f"declared dim {dim}")
        pl = np.random.default_rng(42).standard_normal(
            (vecs.shape[1], n_planes))
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        margins = unit @ pl
        bits = margins > 0
        weights = 1 << np.arange(n_planes)
        codes = (bits * weights).sum(axis=1).astype(np.int64)
        if not n_probe_bits:
            return pa.table({key: b[key],
                             "bucket": pa.array(codes, pa.int64()),
                             col: b[col]})
        # least-confident bit indices per vector, vectorized
        low = np.argsort(np.abs(margins), axis=1)[:, :n_probe_bits]
        all_keys = [b[key]]
        all_codes = [codes]
        all_vecs = [b[col]]
        for j in range(n_probe_bits):
            flipped = codes ^ weights[low[:, j]].astype(np.int64)
            all_keys.append(b[key])
            all_codes.append(flipped)
            all_vecs.append(b[col])
        return pa.table({
            key: pa.concat_arrays([a.combine_chunks() if hasattr(a, "combine_chunks") else a
                                   for a in all_keys]),
            "bucket": pa.array(np.concatenate(all_codes), pa.int64()),
            col: pa.concat_arrays([a.combine_chunks() if hasattr(a, "combine_chunks") else a
                                   for a in all_vecs]),
        })

    pairs_ds = ds.select_columns([key, col]).map_batches(
        bucketize, batch_format="pyarrow").map_batches(
        lambda t: _add_band_part(t, "bucket", 64), batch_format="pyarrow"
    ).groupby("_part").map_groups(
        lambda g: _cosine_pairs_partition(g, key, col, threshold),
        batch_format="pyarrow")
    return _assign_clusters(ds, pairs_ds, key, distributed_cc)


def _cosine_pairs_partition(g: pa.Table, key: str, col: str,
                            threshold: float, chunk: int = 2048) -> pa.Table:
    """One coarse partition's bucket rows → exact-cosine-verified
    pairs; the unit matrix is built once per partition.  The gram
    matrix of a pathologically hot bucket is computed in ``chunk``-row
    strips, so memory stays O(chunk × bucket) no matter how many
    near-identical vectors share one bucket.  Buckets longer than
    ``HOT_RUN_CAP`` verify against the min-id anchor only (≤ m−1
    edges — connectivity-preserving for CC)."""
    if len(g) < 2:
        return _EMPTY_PAIRS.empty_table()
    g, starts, ends = _band_runs(g, "bucket", key)
    ids = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
    vecs = np.asarray(g[col].to_pylist(), np.float64)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = vecs / norms
    chunks_a: list[np.ndarray] = []
    chunks_b: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        sub_ids = ids[s:e]
        sub = unit[s:e]
        if m > HOT_RUN_CAP:
            sims = sub[1:] @ sub[0]
            hit = np.flatnonzero(sims >= threshold)
            if len(hit):
                chunks_a.append(np.full(len(hit), sub_ids[0], np.int64))
                chunks_b.append(sub_ids[1 + hit])
            continue
        for c0 in range(0, m, chunk):
            c1 = min(c0 + chunk, m)
            sims = sub[c0:c1] @ sub.T  # (c1-c0, m)
            ii, jj = np.nonzero(sims >= threshold)
            # upper triangle only (global row index < col index)
            keep = (ii + c0) < jj
            if keep.any():
                chunks_a.append(sub_ids[ii[keep] + c0])
                chunks_b.append(sub_ids[jj[keep]])
    if not chunks_a:
        return _EMPTY_PAIRS.empty_table()
    return pa.table({"a": pa.array(np.concatenate(chunks_a), pa.int64()),
                     "b": pa.array(np.concatenate(chunks_b), pa.int64())})


def semdedup(ds, key: str = "vec_id", col: str = "embedding",
             threshold: float = 0.95, n_clusters: int = 64,
             train_sample: int = 2048,
             distributed_cc: "bool | None" = None):
    """→ Dataset(vec_id, cluster_id): SemDeDup-style semantic dedup
    (Abbas et al. 2023, public): k-means-cluster the embedding space,
    then exact-cosine near-dup verify WITHIN each k-means cell — the
    cluster-then-compare alternative to hyperplane LSH
    (``embedding_dedup``), better recall when near-dups concentrate in
    dense semantic regions.

    Scale shape: centroids train on a deterministic STRATIFIED id-mod
    sample (bounded, driver-side by design) and broadcast via
    ``ray.put``; cell assignment streams per batch; within-cell verify
    is the shared chunked gram kernel with the hot-bucket anchor cap;
    labels attach Dataset-side.  Deterministic (fixed-seed k-means,
    integer stride)."""
    import ray

    from .similarity import deterministic_kmeans

    n = ds.count()
    stride = max(1, n // train_sample)

    def stratified(b: pa.Table) -> pa.Table:
        ids = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(ids % stride == 0))

    sample_rows = ds.select_columns([key, col]).map_batches(
        stratified, batch_format="pyarrow").limit(train_sample).take_all()
    sample = np.asarray([r[col] for r in sample_rows], np.float64)
    centers = deterministic_kmeans(sample, n_clusters)
    ref = ray.put(centers)

    def assign(b: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        vecs = np.asarray(b[col].to_pylist(), np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cells = np.argmax((vecs / norms) @ cm.T, axis=1).astype(np.int64)
        return pa.table({key: b[key],
                         "bucket": pa.array(cells, pa.int64()),
                         col: b[col]})

    pairs_ds = ds.select_columns([key, col]).map_batches(
        assign, batch_format="pyarrow").map_batches(
        lambda t: _add_band_part(t, "bucket", 64), batch_format="pyarrow"
    ).groupby("_part").map_groups(
        lambda g: _cosine_pairs_partition(g, key, col, threshold),
        batch_format="pyarrow")
    return _assign_clusters(ds, pairs_ds, key, distributed_cc)
