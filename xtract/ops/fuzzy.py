"""Fuzzy string matching against a small canonical list (entity
normalization: product titles, site names, license strings).

Shape: the canonical list is broadcast ONCE via ``ray.put`` (the
small-side-broadcast rule — never a shuffle for a list that fits in
one object); each batch computes banded Levenshtein distances in one
pass.  Plain unit-cost Levenshtein (insert/delete/substitute = 1, no
transposition) — the exact function DuckDB exposes, so the oracle
re-scores every row.

Per-pair DP is inherently per-string Python; the op is for SHORT
strings (titles, names) × a SMALL candidate list — cost is
O(rows · n_cand · len²) with an early-exit band at ``max_dist``.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def levenshtein(a: str, b: str, cap: "int | None" = None) -> int:
    """Unit-cost edit distance; with ``cap``, returns cap+1 as soon as
    a full DP row exceeds it (banded early exit)."""
    m, n = len(a), len(b)
    if cap is not None and abs(m - n) > cap:
        return cap + 1
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        ca = a[i - 1]
        cur = [i] + [0] * n
        row_min = i
        for j in range(1, n + 1):
            v = min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != b[j - 1]))
            cur[j] = v
            if v < row_min:
                row_min = v
        if cap is not None and row_min > cap:
            return cap + 1
        prev = cur
    return prev[n]


def fuzzy_match(ds, col: str, candidates: "list[str]", max_dist: int,
                key: str = "doc_id"):
    """→ Dataset(key, best_match, dist): each row's nearest candidate
    by edit distance (ties → lexicographically smallest candidate);
    rows farther than ``max_dist`` from every candidate get
    best_match = '' and dist = -1 (sentinel, keeps the column
    non-null int64)."""
    import ray

    cand_ref = ray.put(sorted(candidates))

    def match(b: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        outs, dists = [], []
        for s in b[col].to_pylist():
            s = s or ""
            best, bd = "", max_dist + 1
            for c in cands:  # sorted → first win is the tie-break
                d = levenshtein(s, c, cap=min(bd, max_dist))
                if d < bd:
                    best, bd = c, d
            if bd > max_dist:
                best, bd = "", -1
            outs.append(best)
            dists.append(bd)
        return pa.table({key: b[key],
                         "best_match": pa.array(outs, pa.string()),
                         "dist": pa.array(np.asarray(dists, np.int64))})

    return ds.map_batches(match, batch_format="pyarrow")
