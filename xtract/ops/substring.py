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

Scale shape (the suffix-array problem re-expressed Ray-Data-first):

1. one streaming pass tokenizes and emits SLIM ``(whash, packed)``
   rows — a rolling polynomial hash over md5-based token hashes, one
   row per window (corpus-token cardinality, but 16 bytes each);
2. a native ``groupby(whash).aggregate(Count, Min(packed))`` finds
   duplicated hashes and their canonical occurrence;
3. the duplicated-hash table is EXACT-COUNT gated (the
   ``DRIVER_CC_LIMIT`` pattern): small → broadcast via ``ray.put``;
   corpus-proportional → a coarse co-group join per whash partition
   (nothing unbounded on the driver, either way);
4. per-doc interval merge is vectorized numpy inside one co-group by
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

from .linedup import BROADCAST_LIMIT

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
                          k: int = 20,
                          broadcast_limit: int = BROADCAST_LIMIT,
                          num_partitions: int = 64):
    """See module docstring.  Deterministic under any partitioning."""
    import ray
    from ray.data.aggregate import Count, Min

    from .agg import _hash_part
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
        return pa.table({"whash": pa.array(whs, pa.int64()),
                         "packed": pa.array(packs, pa.int64())})

    windows = ds.select_columns([key, col]).map_batches(
        explode, batch_format="pyarrow")
    owners = windows.groupby("whash").aggregate(
        Count(alias_name="n_occ"), Min("packed", alias_name="owner"))
    dups = owners.map_batches(
        lambda t: t.filter(pc.greater(t["n_occ"], 1)),
        batch_format="pyarrow").select_columns(["whash", "owner"]).materialize()

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

    # --- resolve non-canonical duplicated occurrences → (doc, pos) ---
    if dups.count() <= broadcast_limit:
        owner_map = {int(r["whash"]): int(r["owner"])
                     for r in dups.take_all()}
        ref = ray.put(owner_map)

        def flag(b: pa.Table) -> pa.Table:
            om = ray.get(ref)
            wh = b["whash"].to_numpy(zero_copy_only=False)
            pk = b["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
            mapped = pd.Series(wh).map(om)
            mask = (mapped.notna().to_numpy()
                    & (mapped.fillna(-1).to_numpy(np.int64) != pk))
            pk = pk[mask]
            return pa.table({key: pa.array(pk // POS_CAP, pa.int64()),
                             "pos": pa.array(pk % POS_CAP, pa.int64())})

        drops = windows.map_batches(flag, batch_format="pyarrow")
    else:
        # co-group per whash partition: windows × dup owners, keep
        # occurrences whose packed != owner (slim int64 exchange only)
        def tag_w(b: pa.Table) -> pa.Table:
            return pa.table({
                "_part": pa.array(_hash_part(b["whash"], num_partitions),
                                  pa.int64()),
                "_f": pa.array(np.zeros(len(b), np.int8)),
                "whash": b["whash"], "packed": b["packed"]})

        def tag_d(b: pa.Table) -> pa.Table:
            return pa.table({
                "_part": pa.array(_hash_part(b["whash"], num_partitions),
                                  pa.int64()),
                "_f": pa.array(np.ones(len(b), np.int8)),
                "whash": b["whash"], "packed": b["owner"]})

        both = windows.map_batches(tag_w, batch_format="pyarrow").union(
            dups.map_batches(tag_d, batch_format="pyarrow"))

        def resolve(t: pa.Table) -> pa.Table:
            w = t.filter(pc.equal(t["_f"], 0))
            d = t.filter(pc.equal(t["_f"], 1))
            if len(w) == 0 or len(d) == 0:
                return pa.table({key: pa.array([], pa.int64()),
                                 "pos": pa.array([], pa.int64())})
            wdf = pd.DataFrame({"h": w["whash"].to_numpy(zero_copy_only=False),
                                "p": w["packed"].to_numpy(zero_copy_only=False)})
            ddf = pd.DataFrame({"h": d["whash"].to_numpy(zero_copy_only=False),
                                "o": d["packed"].to_numpy(zero_copy_only=False)})
            m = wdf.merge(ddf, on="h", how="inner")
            m = m[m["p"] != m["o"]]
            pk = m["p"].to_numpy(np.int64)
            return pa.table({key: pa.array(pk // POS_CAP, pa.int64()),
                             "pos": pa.array(pk % POS_CAP, pa.int64())})

        drops = both.groupby("_part").map_groups(resolve,
                                                 batch_format="pyarrow")

    # --- per-doc interval merge (co-group by doc partition) ---
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

    both2 = doc_stats.map_batches(tag_s, batch_format="pyarrow").union(
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

    return both2.groupby("_part").map_groups(finish, batch_format="pyarrow")
