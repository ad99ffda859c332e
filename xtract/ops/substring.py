"""Exact substring (k-token window) dedup statistics — the
"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2021, public) family: find every k-token window whose exact content
repeats anywhere in the corpus, keep ONE canonical occurrence (the
minimal ``(doc_id, pos)``), and measure how much of each document is
covered by non-canonical duplicated windows.

→ Dataset(doc_id, n_tokens, n_windows, n_dup_windows, n_dup_tokens):
``n_dup_windows`` counts this doc's non-canonical duplicated window
occurrences; ``n_dup_tokens`` is the union length of their ``[pos,
pos+k)`` intervals (classic interval merge) — the token mass an exact
substring scrub would remove.

Scale shape (the suffix-array problem re-expressed Ray-Data-first),
TWO shuffles total and nothing on the driver at any corpus size:

1. one streaming pass tokenizes and emits SLIM ``(_part, whash,
   packed)`` rows — a rolling polynomial hash over md5-based token
   hashes, one 24-byte row per window;
2. ONE coarse co-group by hash partition resolves everything in place:
   within a partition every occurrence of a hash is present, so a
   single vectorized lexsort by (whash, packed) makes the run-first
   element the canonical occurrence and every other run member a
   duplicate — no native aggregate, no broadcast, no driver dict
   (emission is linear in occurrences, so a viral window that repeats
   10^9 times costs one m·log m sort in its partition, not m²);
3. per-doc interval merge is vectorized numpy inside one co-group by
   doc partition.

Hashes are SQL-replicable by construction (md5_number_upper token
hashes, mod-(2^61-1) polynomial) so the driver query gets a full
DuckDB oracle.  Positions are capped at 2^21 tokens/doc (packed
``doc_id*2^21 + pos`` stays in int63); longer docs raise loudly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MOD = (1 << 61) - 1
BASE = 1_000_003
POS_CAP = 1 << 21


def token_hash(w: str) -> int:
    """md5-top-8-bytes little-endian (DuckDB ``md5_number_upper``),
    reduced mod 2^61-1."""
    return int.from_bytes(hashlib.md5(w.encode()).digest()[:8],
                          "little") % MOD


def window_hashes(tokens: list[str], k: int,
                  _cache: "dict[str, int] | None" = None) -> list[int]:
    """Rolling polynomial hash of every k-token window (O(n))."""
    n = len(tokens)
    if n < k:
        return []
    cache = _cache if _cache is not None else {}
    hs = []
    for w in tokens:
        h = cache.get(w)
        if h is None:
            h = cache[w] = token_hash(w)
        hs.append(h)
    out = []
    top = pow(BASE, k - 1, MOD)
    h = 0
    for i, v in enumerate(hs):
        if i >= k:
            h = (h - hs[i - k] * top) % MOD
        h = (h * BASE + v) % MOD
        if i >= k - 1:
            out.append(h)
    return out


def substring_dedup_stats(ds, key: str = "doc_id", col: str = "text",
                          k: int = 20, num_partitions: int = 64):
    """See module docstring.  Deterministic under any partitioning."""
    from .vocab import sql_tokens

    def explode(b: pa.Table) -> pa.Table:
        cache: dict[str, int] = {}
        whs, packs = [], []
        for d, t in zip(b[key].to_pylist(), b[col].to_pylist()):
            toks = sql_tokens(t or "")
            if len(toks) >= POS_CAP:
                raise ValueError(
                    f"doc {d}: {len(toks)} tokens exceeds POS_CAP={POS_CAP}")
            base = int(d) * POS_CAP
            for p, h in enumerate(window_hashes(toks, k, cache)):
                whs.append(h)
                packs.append(base + p)
        wh = np.asarray(whs, np.int64)
        return pa.table({"_part": pa.array(wh % num_partitions),
                         "whash": pa.array(wh),
                         "packed": pa.array(packs, pa.int64())})

    windows = ds.select_columns([key, col]).map_batches(
        explode, batch_format="pyarrow")

    def resolve(t: pa.Table) -> pa.Table:
        """One hash partition → its non-canonical duplicated
        occurrences.  Vectorized: lexsort by (whash, packed); the first
        element of every equal-whash run is the canonical (min-packed)
        occurrence, every other run member is a duplicate."""
        wh = t["whash"].to_numpy(zero_copy_only=False)
        pk = t["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pk, wh))
        wh_s = wh[order]
        first = np.ones(len(wh_s), bool)
        first[1:] = wh_s[1:] != wh_s[:-1]
        pk_d = pk[order][~first]
        return pa.table({key: pa.array(pk_d // POS_CAP, pa.int64()),
                         "pos": pa.array(pk_d % POS_CAP, pa.int64())})

    drops = windows.groupby("_part").map_groups(resolve,
                                                batch_format="pyarrow")

    def stats_rows(b: pa.Table) -> pa.Table:
        ks, nt, nw = [], [], []
        for d, t in zip(b[key].to_pylist(), b[col].to_pylist()):
            toks = sql_tokens(t or "")
            ks.append(d)
            nt.append(len(toks))
            nw.append(max(len(toks) - k + 1, 0))
        return pa.table({key: pa.array(ks),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "n_windows": pa.array(nw, pa.int64())})

    doc_stats = ds.select_columns([key, col]).map_batches(
        stats_rows, batch_format="pyarrow")

    # --- per-doc interval merge (co-group by doc partition) ---
    from .agg import _hash_part

    def tag_s(b: pa.Table) -> pa.Table:
        return pa.table({
            "_part": pa.array(_hash_part(b[key], num_partitions), pa.int64()),
            "_f": pa.array(np.zeros(len(b), np.int8)),
            key: pc.cast(b[key], pa.int64()),
            "n_tokens": b["n_tokens"], "n_windows": b["n_windows"],
            "pos": pa.nulls(len(b), pa.int64())})

    def tag_p(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table({
            "_part": pa.array(_hash_part(b[key], num_partitions), pa.int64()),
            "_f": pa.array(np.ones(n, np.int8)),
            key: pc.cast(b[key], pa.int64()),
            "n_tokens": pa.nulls(n, pa.int64()),
            "n_windows": pa.nulls(n, pa.int64()),
            "pos": b["pos"]})

    both = doc_stats.map_batches(tag_s, batch_format="pyarrow").union(
        drops.map_batches(tag_p, batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["_f"], 0))
        p = t.filter(pc.equal(t["_f"], 1))
        ids = s[key].to_numpy(zero_copy_only=False)
        ndw = np.zeros(len(ids), np.int64)
        ndt = np.zeros(len(ids), np.int64)
        if len(p):
            pdf = pd.DataFrame({
                "d": p[key].to_numpy(zero_copy_only=False),
                "p": p["pos"].to_numpy(zero_copy_only=False)})
            byd = {d: np.sort(g.to_numpy(np.int64))
                   for d, g in pdf.groupby("d", sort=False)["p"]}
            for i, d in enumerate(ids):
                ps = byd.get(d)
                if ps is None:
                    continue
                ndw[i] = len(ps)
                # interval merge of [p, p+k): new island when the gap to
                # the previous position exceeds k
                breaks = np.flatnonzero(np.diff(ps) > k)
                starts = ps[np.concatenate(([0], breaks + 1))]
                ends = ps[np.concatenate((breaks, [len(ps) - 1]))] + k
                ndt[i] = int((ends - starts).sum())
        return pa.table({key: s[key],
                         "n_tokens": s["n_tokens"],
                         "n_windows": s["n_windows"],
                         "n_dup_windows": pa.array(ndw),
                         "n_dup_tokens": pa.array(ndt)})

    return both.groupby("_part").map_groups(finish, batch_format="pyarrow")
