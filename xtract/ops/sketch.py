"""Cardinality sketches: distributed HyperLogLog approximate distinct
count (public algorithm — Flajolet et al. 2007, with the standard
small-range linear-counting correction).

Shape: one ``map_batches`` pass builds a 2^p-register sketch PER BLOCK
(vectorized: hash → bucket/leading-zero rank via numpy, ``np.maximum.at``
into the registers); one register row per block reaches the driver
(bounded by block count, never row count) and merges by elementwise
max — the sketch's defining property, which also makes the result
independent of partitioning.  Hashing is splitmix64 (stable across
machines/runs), so the estimate is deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _mix64


def _hash_strings(vals: list, seed: int = 0x9E3779B97F4A7C15) -> np.ndarray:
    """Stable 64-bit hashes for arbitrary values (utf-8 bytes through
    blake2b — vectorizing string hashing fully needs a C kernel; the
    per-row digest is the one scalar loop here and it is cheap relative
    to tokenization upstream)."""
    import hashlib

    out = np.empty(len(vals), np.uint64)
    for i, v in enumerate(vals):
        b = v if isinstance(v, bytes) else str(v).encode("utf-8")
        out[i] = int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(),
                                "big")
    return out


def _block_registers(vals_hashed: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(vals_hashed) == 0:
        return regs
    idx = (vals_hashed >> np.uint64(64 - p)).astype(np.int64)
    rest = vals_hashed << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1 (capped)
    # count via float exponent trick is imprecise; use bit scan:
    rank = np.full(len(vals_hashed), 64 - p + 1, np.uint8)
    nz = rest != 0
    # position of highest set bit → leading zeros
    hz = np.zeros(len(vals_hashed), np.int64)
    r = rest[nz]
    bits = np.zeros(len(r), np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        step = r >> np.uint64(shift)
        gt = step != 0
        bits[gt] += shift
        r = np.where(gt, step, r)
    hz[nz] = 63 - bits
    rank[nz] = (hz[nz] + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Registers → cardinality estimate (standard bias-corrected HLL
    with linear counting below 2.5·m)."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def heavy_hitters(ds, col: str, k: int = 20, capacity: int = 4096):
    """Bounded-memory frequent-values summary (Misra–Gries / space-
    saving family, public algorithm): → (topk_df, max_undercount).

    Per block: EXACT vectorized counts (``np.unique``), truncated to
    the ``capacity`` largest (ties broken by value — deterministic);
    the shuffle then moves ≤ capacity slim rows per block no matter how
    skewed the column is.  One ``groupby(val).Sum`` merge, one
    distributed sort+limit for the top-k.  ``max_undercount`` =
    Σ dropped mass (total non-null values − Σ merged counts), the
    standard MG guarantee: every reported count is an UNDER-estimate by
    at most ``max_undercount``, and any value absent from the merged
    table has true count ≤ ``max_undercount``.  When every block holds
    ≤ capacity distinct values the summary is EXACT
    (max_undercount == 0) — which also makes it SQL-checkable.

    The bound needs the total non-null count — one extra pruned
    single-column scan (cheap next to the counting pass)."""
    from ray.data.aggregate import Sum

    def block_counts(b: pa.Table) -> pa.Table:
        arr = b[col].combine_chunks()
        arr = arr.drop_null()
        if len(arr) == 0:
            return pa.table({"val": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vals = np.asarray(arr.to_pylist(), dtype=object)
        u, cnt = np.unique(vals, return_counts=True)
        if len(u) > capacity:
            order = np.lexsort((u, -cnt))[:capacity]
            u, cnt = u[order], cnt[order]
        return pa.table({"val": pa.array([str(x) for x in u], pa.string()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    merged = (ds.select_columns([col])
              .map_batches(block_counts, batch_format="pyarrow")
              .groupby("val").aggregate(Sum("n", alias_name="n"))
              .materialize())
    kept_mass = merged.sum("n") or 0
    total = (ds.select_columns([col])
             .map_batches(lambda t: pa.table({"nn": pa.array(
                 [len(t) - t[col].null_count], pa.int64())}),
                 batch_format="pyarrow")
             .sum("nn") or 0)
    topk = (merged.sort(["n", "val"], descending=[True, False])
            .limit(k).to_pandas())
    return topk, int(total - kept_mass)


def approx_distinct(ds, col: str, p: int = 12,
                    tokenize: bool = False) -> float:
    """Approximate number of distinct values in ``col`` (or distinct
    ``[a-z]+`` tokens of a text column when ``tokenize=True``).
    Deterministic, partition-independent, ±~1.04/√(2^p) relative error."""
    from .vocab import sql_tokens

    def block_sketch(b: pa.Table) -> pa.Table:
        if tokenize:
            toks: set = set()
            for t in b[col].to_pylist():
                toks.update(sql_tokens(t))
            hs = _hash_strings(sorted(toks))
        else:
            hs = _hash_strings(b[col].to_pylist())
        regs = _block_registers(hs, p)
        return pa.table({"regs": pa.FixedSizeListArray.from_arrays(
            pa.array(regs, pa.uint8()), len(regs))})

    m = 1 << p

    def merge_rows(b: pa.Table) -> pa.Table:
        """Elementwise-max fold of up to ``batch_size`` register rows
        into ONE — a Dataset-side reduction tree, so the driver only
        ever sees O(n_blocks / 4096) rows, not one per input block."""
        if len(b) == 0:
            return b
        mat = (b["regs"].combine_chunks().flatten()
               .to_numpy(zero_copy_only=False).reshape(len(b), m))
        merged = mat.max(axis=0).astype(np.uint8)
        return pa.table({"regs": pa.FixedSizeListArray.from_arrays(
            pa.array(merged, pa.uint8()), m)})

    rows = (ds.select_columns([col])
            .map_batches(block_sketch, batch_format="pyarrow")
            .map_batches(merge_rows, batch_format="pyarrow",
                         batch_size=4096)
            .take_all())  # ≤ n_blocks/4096 rows reach the driver
    merged = np.zeros(m, np.uint8)
    for r in rows:
        merged = np.maximum(merged, np.asarray(r["regs"], np.uint8))
    return hll_estimate(merged)


def countmin_counts(ds, col: str, queries: list, width_bits: int = 16,
                    depth: int = 4) -> dict:
    """Count-min sketch (Cormode & Muthukrishnan 2005): → {value:
    estimated count} for each queried value, with the classic one-sided
    guarantee est ≥ true (always) and est ≤ true + εN with high
    probability (ε ≈ e / 2^width_bits per row, amplified by ``depth``
    independent rows).  The complement of `heavy_hitters` (which
    under-counts with a reported bound) — use count-min when the query
    set is known and the value space is unbounded.

    Deterministic and partition-independent: counters are int64 sums
    (commutative), hashing is the stable blake2b/splitmix stack, so the
    same corpus gives the SAME estimates at any parallelism.  Shape:
    one pass builds a depth×2^width_bits counter block per ~256k rows
    (vectorized ``np.add.at``), a sum-fold reduction tree hands the
    driver O(blocks/4096) matrices."""
    width = 1 << width_bits
    mask = np.uint64(width - 1)
    seeds = [np.uint64((0xA076_1D64_78BD_642F + 0x9E37_79B9 * i) | 1)
             for i in range(depth)]  # odd multipliers only

    def positions(vals: list) -> np.ndarray:
        h = _hash_strings(vals)
        return np.stack([((h * s) >> np.uint64(64 - width_bits)) & mask
                         for s in seeds])  # (depth, n)

    def block_sketch(b: pa.Table) -> pa.Table:
        arr = b[col].combine_chunks().drop_null()
        mat = np.zeros((depth, width), np.int64)
        if len(arr):
            pos = positions(arr.to_pylist())
            for r in range(depth):
                np.add.at(mat[r], pos[r].astype(np.int64), 1)
        return pa.table({"cm": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.int64()), depth * width)})

    def sum_fold(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        mat = (t["cm"].combine_chunks().flatten()
               .to_numpy(zero_copy_only=False)
               .reshape(len(t), depth * width))
        return pa.table({"cm": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.sum(axis=0, dtype=np.int64), pa.int64()),
            depth * width)})

    rows = (ds.select_columns([col])
            .map_batches(block_sketch, batch_format="pyarrow",
                         batch_size=262_144)
            .map_batches(sum_fold, batch_format="pyarrow", batch_size=64)
            .map_batches(sum_fold, batch_format="pyarrow", batch_size=64)
            .take_all())
    mat = np.zeros((depth, width), np.int64)
    for r in rows:
        mat += np.asarray(r["cm"], np.int64).reshape(depth, width)

    qpos = positions(list(queries))
    out = {}
    for i, q in enumerate(queries):
        out[q] = int(min(mat[r, int(qpos[r, i])] for r in range(depth)))
    return out


def grouped_approx_distinct(ds, key: str, col: str, p: int = 10,
                            num_partitions: int = 32):
    """Approximate distinct ``col`` values PER ``key`` — the grouped
    HLL (e.g. distinct users per host when exact per-key distinct is
    too wide to co-group).  Deterministic and partition-independent:
    same hash, elementwise register max commutes.

    Shape: each block emits ≤ |keys in block| register rows (a per-key
    combiner, 2^p bytes each) → coarse co-group by key-hash partition
    → per-partition vectorized elementwise-max per key run → ONE row
    per key.  Nothing corpus-proportional reaches the driver; the
    exchange carries (keys × 2^p) bytes, independent of row count.

    → Dataset(key, approx_distinct int64).  Memory note: 2^p per key
    per block — keep p modest (default 1 KiB/key).
    """
    from .agg import _hash_part

    m = 1 << p

    def block_sketch(b: pa.Table) -> pa.Table:
        ks = np.asarray(b[key].to_pylist(), dtype=object)
        hs = _hash_strings(b[col].to_pylist())
        order = np.argsort(ks, kind="stable")
        ks, hs = ks[order], hs[order]
        change = np.ones(len(ks), bool)
        change[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(ks))
        out_k, out_r = [], []
        for s, e in zip(starts, ends):
            out_k.append(ks[s])
            out_r.append(_block_registers(hs[s:e], p))
        regs = np.concatenate(out_r) if out_r else np.empty(0, np.uint8)
        return pa.table({
            "k": pa.array(out_k, pa.string()),
            "regs": pa.FixedSizeListArray.from_arrays(
                pa.array(regs, pa.uint8()), m)})

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_part", pa.array(
            _hash_part(b["k"], num_partitions), pa.int64()))

    def finish(g: pa.Table) -> pa.Table:
        ks = np.asarray(g["k"].to_pylist(), dtype=object)
        mat = (g["regs"].combine_chunks().flatten()
               .to_numpy(zero_copy_only=False).reshape(len(g), m))
        order = np.argsort(ks, kind="stable")
        ks, mat = ks[order], mat[order]
        change = np.ones(len(ks), bool)
        change[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(ks))
        out_k, out_n = [], []
        for s, e in zip(starts, ends):
            merged = mat[s:e].max(axis=0)
            out_k.append(ks[s])
            out_n.append(int(round(hll_estimate(merged))))
        return pa.table({
            key: pa.array(out_k, pa.string()),
            "approx_distinct": pa.array(out_n, pa.int64())})

    return (ds.select_columns([key, col])
            .map_batches(block_sketch, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(finish, batch_format="pyarrow"))
